// Smoke tests for the N-API binding (run with `npm test` where a Node
// toolchain exists; mirrored by tests/test_bindings.py's Perl consumer in CI).
"use strict";
const assert = require("assert");
const tc = require("./index.js");

assert.ok(tc.version() >= 1);
assert.strictEqual(tc.bytesum("hi"), 209n); // reference hash.h:98-103 vector
assert.strictEqual(
  tc.sha256("abc").toString("hex"),
  "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad");
assert.strictEqual(tc.hash("x", 0n), tc.hash("x", 0n));
assert.notStrictEqual(tc.hash("x", 0n), tc.hash("x", 1n));
assert.deepStrictEqual(tc.fillRandom(32, 7n), tc.fillRandom(32, 7n));
assert.deepStrictEqual(tc.tokenizeWs("a bc  d"), [[0, 1], [2, 4], [6, 7]]);
assert.deepStrictEqual(tc.utf8Decode(Buffer.from("aé😀")), [0x61, 0xe9, 0x1f600]);
assert.strictEqual(tc.utf8Encode([0x61, 0xe9, 0x1f600]).toString(), "aé😀");
const words = ["pear", "Apple", "apple", "fig"];
const order = tc.argsort(words);
assert.deepStrictEqual(order.map((i) => words[i]), [...words].sort());
console.log("all javascript binding tests passed");
