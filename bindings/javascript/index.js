// JavaScript surface over the tapecraft N-API addon — mirrors the shape of
// the reference's javascript binding (javascript/stringzilla.js): Buffer in,
// Buffer/BigInt/Array out, zero copies beyond the FFI boundary.
"use strict";

const native = require("./build/Release/tapecraft.node");

module.exports = {
  version: native.version,
  /** Sum of all bytes of a Buffer → BigInt. */
  bytesum: (buf) => native.bytesum(Buffer.from(buf)),
  /** 64-bit seeded hash → BigInt (bit-identical to the Python surface). */
  hash: (buf, seed = 0n) => native.hash(Buffer.from(buf), BigInt(seed)),
  /** FIPS 180-4 SHA-256 → 32-byte Buffer. */
  sha256: (buf) => native.sha256(Buffer.from(buf)),
  /** AES-CTR pseudo-random bytes, reproducible per nonce. */
  fillRandom: (n, nonce = 0n) => native.fillRandom(n, BigInt(nonce)),
  /** Whitespace-token [start, end) spans → Array<[number, number]>. */
  tokenizeWs(buf) {
    const flat = native.tokenizeWs(Buffer.from(buf));
    const out = [];
    for (let i = 0; i < flat.length; i += 2) out.push([flat[i], flat[i + 1]]);
    return out;
  },
  /** Line [start, end) spans → Array<[number, number]>. */
  splitLines(buf) {
    const flat = native.splitLines(Buffer.from(buf));
    const out = [];
    for (let i = 0; i < flat.length; i += 2) out.push([flat[i], flat[i + 1]]);
    return out;
  },
  /** UTF-8 → Array of code points (U+FFFD per maximal subpart). */
  utf8Decode: (buf) => native.utf8Decode(Buffer.from(buf)),
  /** Code points → UTF-8 Buffer. */
  utf8Encode: (runes) => native.utf8Encode(runes),
  /** Stable lexicographic argsort of an array of Buffers/strings. */
  argsort: (items) => native.argsort(items.map((x) => Buffer.from(x))),
};
