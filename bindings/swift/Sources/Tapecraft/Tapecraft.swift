// Swift binding over the tapecraft stable C ABI — the analog of the
// reference's swift/StringProtocol+StringZilla.swift surface over its C99
// ABI, expressed as extensions on the standard protocols.
//
// Covers the host tier: hashing, SHA-256, PRNG fill, tokenization, UTF-8
// decode/encode, sort-key export + argsort.  Device work stays behind the
// Python engine API (see bindings/README.md).
//
// NOTE: compile-ready but NOT compiled in the repo's CI image (no swiftc
// there); tests/test_bindings.py drift-checks the symbol usage.
// Package layout: Sources/CTapecraft (system library wrapping tapecraft.h)
// + this module.

import CTapecraft
import Foundation

public enum Tapecraft {
    /// ABI version of the linked libtapecraft.
    public static var version: Int32 { tc_version() }

    /// AES-CTR pseudo-random bytes, reproducible per nonce.
    public static func fillRandom(count: Int, nonce: UInt64 = 0) -> [UInt8] {
        var out = [UInt8](repeating: 0, count: count)
        out.withUnsafeMutableBufferPointer {
            tc_fill_random($0.baseAddress, Int64(count), nonce)
        }
        return out
    }

    /// Encode scalar code points to UTF-8 bytes.
    public static func utf8Encode(_ runes: [UInt32]) -> [UInt8] {
        var out = [UInt8](repeating: 0, count: 4 * runes.count + 1)
        let n = runes.withUnsafeBufferPointer { r in
            out.withUnsafeMutableBufferPointer { o in
                tc_utf8_encode(r.baseAddress, Int64(runes.count), o.baseAddress)
            }
        }
        return Array(out.prefix(Int(n)))
    }

    /// Stable lexicographic argsort via the pgram-key export + MSD key
    /// sort pipeline (reference sort.h:9-16).
    public static func argsort<S: Sequence>(_ items: S) -> [Int64]
    where S.Element: StringProtocol {
        let blobs = items.map { Array($0.utf8) }
        guard !blobs.isEmpty else { return [] }
        var blob: [UInt8] = []
        var starts: [Int64] = []
        var ends: [Int64] = []
        var words = 1
        for b in blobs {
            starts.append(Int64(blob.count))
            blob.append(contentsOf: b)
            ends.append(Int64(blob.count))
            words = max(words, (b.count + 3) / 4)
        }
        var keys = [UInt32](repeating: 0, count: blobs.count * (words + 1))
        var order = [Int64](repeating: 0, count: blobs.count)
        blob.withUnsafeBufferPointer { d in
            starts.withUnsafeBufferPointer { s in
                ends.withUnsafeBufferPointer { e in
                    keys.withUnsafeMutableBufferPointer { k in
                        tc_pgram_keys(d.baseAddress, s.baseAddress,
                                      e.baseAddress, Int64(blobs.count),
                                      k.baseAddress, Int32(words), 0, 0)
                    }
                }
            }
        }
        keys.withUnsafeBufferPointer { k in
            order.withUnsafeMutableBufferPointer { o in
                tc_argsort_keys(k.baseAddress, Int64(blobs.count),
                                Int32(words + 1), o.baseAddress)
            }
        }
        return order
    }
}

extension Sequence where Element == UInt8 {
    /// Sum of all bytes (reference sz_bytesum, hash.h:110).
    public var byteSum: UInt64 {
        let bytes = Array(self)
        return bytes.withUnsafeBufferPointer {
            tc_bytesum($0.baseAddress, Int64(bytes.count))
        }
    }

    /// 64-bit seeded hash, bit-identical to the reference contract.
    public func hash(seed: UInt64 = 0) -> UInt64 {
        let bytes = Array(self)
        return bytes.withUnsafeBufferPointer {
            tc_hash($0.baseAddress, Int64(bytes.count), seed)
        }
    }

    /// FIPS 180-4 SHA-256 digest.
    public var sha256: [UInt8] {
        let bytes = Array(self)
        var digest = [UInt8](repeating: 0, count: 32)
        bytes.withUnsafeBufferPointer { d in
            digest.withUnsafeMutableBufferPointer { o in
                tc_sha256(d.baseAddress, Int64(bytes.count), o.baseAddress)
            }
        }
        return digest
    }

    /// Decode UTF-8 to code points, U+FFFD per maximal subpart.
    public var utf8Runes: [UInt32] {
        let bytes = Array(self)
        guard !bytes.isEmpty else { return [] }
        var runes = [UInt32](repeating: 0, count: bytes.count)
        var offs = [Int32](repeating: 0, count: bytes.count + 1)
        let n = bytes.withUnsafeBufferPointer { d in
            runes.withUnsafeMutableBufferPointer { r in
                offs.withUnsafeMutableBufferPointer { o in
                    tc_utf8_decode(d.baseAddress, Int64(bytes.count),
                                   r.baseAddress, o.baseAddress)
                }
            }
        }
        return Array(runes.prefix(Int(n)))
    }

    /// Whitespace-token (start, end) byte spans.
    public var whitespaceTokenSpans: [(Int64, Int64)] {
        bounds(tc_tokenize_ws)
    }

    /// Line (start, end) byte spans.
    public var lineSpans: [(Int64, Int64)] {
        bounds(tc_split_lines)
    }

    private func bounds(
        _ f: (UnsafePointer<UInt8>?, Int64, UnsafeMutablePointer<Int64>?, Int64)
            -> Int64
    ) -> [(Int64, Int64)] {
        let bytes = Array(self)
        return bytes.withUnsafeBufferPointer { d in
            let count = f(d.baseAddress, Int64(bytes.count), nil, 0)
            var flat = [Int64](repeating: 0, count: Int(2 * count))
            flat.withUnsafeMutableBufferPointer {
                _ = f(d.baseAddress, Int64(bytes.count), $0.baseAddress, count)
            }
            return stride(from: 0, to: flat.count, by: 2).map {
                (flat[$0], flat[$0 + 1])
            }
        }
    }
}

extension StringProtocol {
    /// 64-bit seeded hash of the UTF-8 bytes.
    public func tapecraftHash(seed: UInt64 = 0) -> UInt64 {
        Array(utf8).hash(seed: seed)
    }

    /// SHA-256 of the UTF-8 bytes.
    public var sha256: [UInt8] { Array(utf8).sha256 }
}
