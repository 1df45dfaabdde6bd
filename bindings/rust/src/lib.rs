//! Rust binding over the stringzilla-tpu host-runtime C ABI
//! (`native/tapecraft.h`) — the analog of the reference's
//! `rust/stringzilla.rs:938-1656` trait surface over its C99 ABI.
//!
//! Device work (batched edit distances, fingerprints, on-chip search)
//! stays behind the Python engine API; this crate covers the host tier:
//! hashing, SHA-256, PRNG fill, tokenization, UTF-8, case folding,
//! uncased search, and collection argsort.
//!
//! NOTE: this crate is compile-ready but NOT compiled in the repo's CI
//! image (no rustc there); `tests/test_bindings.py` keeps its symbol
//! usage in sync with the header instead.

use std::os::raw::c_int;

extern "C" {
    fn tc_version() -> c_int;
    fn tc_bytesum(data: *const u8, n: i64) -> u64;
    fn tc_hash(data: *const u8, n: i64, seed: u64) -> u64;
    fn tc_hash_bounds(data: *const u8, starts: *const i64, ends: *const i64,
                      count: i64, seed: u64, out: *mut u64);
    fn tc_fill_random(out: *mut u8, n: i64, nonce: u64);
    fn tc_sha256(data: *const u8, n: i64, out32: *mut u8);
    fn tc_sha256_compress(state: *mut u32, block: *const u8, nblocks: i64);
    fn tc_tokenize_ws(data: *const u8, n: i64, bounds: *mut i64, cap: i64) -> i64;
    fn tc_split_lines(data: *const u8, n: i64, bounds: *mut i64, cap: i64) -> i64;
    fn tc_utf8_decode(data: *const u8, n: i64, runes: *mut u32,
                      offsets: *mut i32) -> i64;
    fn tc_utf8_encode(runes: *const u32, count: i64, out: *mut u8) -> i64;
    fn tc_utf8_fold_bytes(data: *const u8, n: i64, fold1: *const u32,
                          mkeys: *const u32, moffs: *const i64,
                          mvals: *const u32, mcount: i64, out: *mut u8) -> i64;
    fn tc_utf8_uncased_find(data: *const u8, n: i64, nd: *const u32, k: i64,
                            start_rune: i64, fold1: *const u32,
                            mkeys: *const u32, moffs: *const i64,
                            mvals: *const u32, mcount: i64, out_off: *mut i64,
                            out_len: *mut i64) -> c_int;
    fn tc_pgram_keys(data: *const u8, starts: *const i64, ends: *const i64,
                     count: i64, out: *mut u32, words_per_str: c_int,
                     uncased: c_int, reverse: c_int);
    fn tc_argsort_keys(keys: *const u32, n: i64, w: i32, order: *mut i64);
}

/// ABI version of the linked libtapecraft.
pub fn version() -> i32 {
    unsafe { tc_version() }
}

/// Sum of all bytes (reference `sz_bytesum`, hash.h:110).
pub fn bytesum(data: impl AsRef<[u8]>) -> u64 {
    let d = data.as_ref();
    unsafe { tc_bytesum(d.as_ptr(), d.len() as i64) }
}

/// 64-bit seeded hash, bit-identical to the reference `sz_hash` contract.
pub fn hash(data: impl AsRef<[u8]>, seed: u64) -> u64 {
    let d = data.as_ref();
    unsafe { tc_hash(d.as_ptr(), d.len() as i64, seed) }
}

/// One hash per (start, end) span of a shared buffer.
pub fn hash_spans(data: &[u8], spans: &[(i64, i64)], seed: u64) -> Vec<u64> {
    let starts: Vec<i64> = spans.iter().map(|s| s.0).collect();
    let ends: Vec<i64> = spans.iter().map(|s| s.1).collect();
    let mut out = vec![0u64; spans.len()];
    unsafe {
        tc_hash_bounds(data.as_ptr(), starts.as_ptr(), ends.as_ptr(),
                       spans.len() as i64, seed, out.as_mut_ptr());
    }
    out
}

/// AES-CTR pseudo-random bytes, reproducible per nonce across backends.
pub fn fill_random(n: usize, nonce: u64) -> Vec<u8> {
    let mut out = vec![0u8; n];
    unsafe { tc_fill_random(out.as_mut_ptr(), n as i64, nonce) };
    out
}

/// FIPS 180-4 SHA-256 digest.
pub fn sha256(data: impl AsRef<[u8]>) -> [u8; 32] {
    let d = data.as_ref();
    let mut out = [0u8; 32];
    unsafe { tc_sha256(d.as_ptr(), d.len() as i64, out.as_mut_ptr()) };
    out
}

/// Streaming SHA-256 compressor state (8 H-words over 64-byte blocks).
pub struct Sha256State(pub [u32; 8]);

impl Sha256State {
    pub fn new() -> Self {
        Sha256State([
            0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a, 0x510e527f,
            0x9b05688c, 0x1f83d9ab, 0x5be0cd19,
        ])
    }
    /// `blocks.len()` must be a multiple of 64.
    pub fn compress(&mut self, blocks: &[u8]) {
        assert_eq!(blocks.len() % 64, 0);
        unsafe {
            tc_sha256_compress(self.0.as_mut_ptr(), blocks.as_ptr(),
                               (blocks.len() / 64) as i64)
        }
    }
}

fn bounds_call(
    f: unsafe extern "C" fn(*const u8, i64, *mut i64, i64) -> i64,
    data: &[u8],
) -> Vec<(i64, i64)> {
    let n = unsafe { f(data.as_ptr(), data.len() as i64, std::ptr::null_mut(), 0) };
    let mut bounds = vec![0i64; (2 * n) as usize];
    unsafe { f(data.as_ptr(), data.len() as i64, bounds.as_mut_ptr(), n) };
    bounds.chunks_exact(2).map(|c| (c[0], c[1])).collect()
}

/// Whitespace-token (start, end) byte spans.
pub fn tokenize_ws(data: impl AsRef<[u8]>) -> Vec<(i64, i64)> {
    bounds_call(tc_tokenize_ws, data.as_ref())
}

/// Line (start, end) byte spans.
pub fn split_lines(data: impl AsRef<[u8]>) -> Vec<(i64, i64)> {
    bounds_call(tc_split_lines, data.as_ref())
}

/// Decode UTF-8 to scalar runes, U+FFFD per maximal subpart.
pub fn utf8_decode(data: impl AsRef<[u8]>) -> Vec<u32> {
    let d = data.as_ref();
    let mut runes = vec![0u32; d.len()];
    let mut offs = vec![0i32; d.len() + 1];
    let n = unsafe {
        tc_utf8_decode(d.as_ptr(), d.len() as i64, runes.as_mut_ptr(),
                       offs.as_mut_ptr())
    };
    runes.truncate(n as usize);
    runes
}

/// Encode scalar runes to UTF-8 bytes.
pub fn utf8_encode(runes: &[u32]) -> Vec<u8> {
    let mut out = vec![0u8; 4 * runes.len() + 1];
    let n = unsafe {
        tc_utf8_encode(runes.as_ptr(), runes.len() as i64, out.as_mut_ptr())
    };
    out.truncate(n as usize);
    out
}

/// Caller-loaded UCD fold tables (dump once from Python:
/// `stringzilla_tpu.ops.ucd` arrays via `numpy.tofile`).
pub struct FoldTables {
    pub fold1: Vec<u32>,
    pub mkeys: Vec<u32>,
    pub moffs: Vec<i64>,
    pub mvals: Vec<u32>,
}

impl FoldTables {
    /// Full Unicode case folding of a UTF-8 buffer (ß→ss, ﬃ→ffi, ...).
    pub fn fold(&self, data: impl AsRef<[u8]>) -> Vec<u8> {
        let d = data.as_ref();
        let mut out = vec![0u8; 3 * d.len() + 16];
        let n = unsafe {
            tc_utf8_fold_bytes(d.as_ptr(), d.len() as i64,
                               self.fold1.as_ptr(), self.mkeys.as_ptr(),
                               self.moffs.as_ptr(), self.mvals.as_ptr(),
                               self.mkeys.len() as i64, out.as_mut_ptr())
        };
        out.truncate(n as usize);
        out
    }

    /// Case-insensitive substring search folding on the fly; returns the
    /// (offset, length) byte span in the original buffer.
    pub fn uncased_find(&self, hay: impl AsRef<[u8]>, needle: impl AsRef<[u8]>)
                        -> Option<(usize, usize)> {
        let h = hay.as_ref();
        let folded = self.fold(needle);
        let nd = utf8_decode(&folded);
        let (mut off, mut len) = (0i64, 0i64);
        let hit = unsafe {
            tc_utf8_uncased_find(h.as_ptr(), h.len() as i64, nd.as_ptr(),
                                 nd.len() as i64, 0, self.fold1.as_ptr(),
                                 self.mkeys.as_ptr(), self.moffs.as_ptr(),
                                 self.mvals.as_ptr(), self.mkeys.len() as i64,
                                 &mut off, &mut len)
        };
        (hit != 0).then(|| (off as usize, len as usize))
    }
}

/// Stable lexicographic argsort of a string collection via the pgram-key
/// export + MSD key sort pipeline (reference sort.h:9-16).
pub fn argsort<S: AsRef<[u8]>>(items: &[S]) -> Vec<i64> {
    if items.is_empty() {
        return Vec::new();
    }
    let mut blob = Vec::new();
    let mut starts = Vec::with_capacity(items.len());
    let mut ends = Vec::with_capacity(items.len());
    let mut words = 1usize;
    for it in items {
        let b = it.as_ref();
        starts.push(blob.len() as i64);
        blob.extend_from_slice(b);
        ends.push(blob.len() as i64);
        words = words.max((b.len() + 3) / 4);
    }
    let mut keys = vec![0u32; items.len() * (words + 1)];
    let mut order = vec![0i64; items.len()];
    unsafe {
        tc_pgram_keys(blob.as_ptr(), starts.as_ptr(), ends.as_ptr(),
                      items.len() as i64, keys.as_mut_ptr(), words as c_int,
                      0, 0);
        tc_argsort_keys(keys.as_ptr(), items.len() as i64, (words + 1) as i32,
                        order.as_mut_ptr());
    }
    order
}

#[cfg(test)]
mod tests {
    use super::*;

    #[test]
    fn vectors() {
        assert_eq!(bytesum("hi"), 209); // reference hash.h:98-103 doc vector
        assert_eq!(
            hex(&sha256("abc")),
            "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
        );
        assert_eq!(hash("x", 0), hash("x", 0));
        assert_ne!(hash("x", 0), hash("x", 1));
        assert_eq!(fill_random(64, 7), fill_random(64, 7));
    }

    #[test]
    fn utf8_roundtrip() {
        let runes = utf8_decode("aé😀".as_bytes());
        assert_eq!(runes, vec![0x61, 0xE9, 0x1F600]);
        assert_eq!(utf8_encode(&runes), "aé😀".as_bytes());
    }

    #[test]
    fn sorting() {
        let words = ["pear", "Apple", "apple", "fig", "apple"];
        let order = argsort(&words);
        let got: Vec<&str> = order.iter().map(|&i| words[i as usize]).collect();
        let mut want = words.to_vec();
        want.sort();
        assert_eq!(got, want);
    }

    fn hex(d: &[u8]) -> String {
        d.iter().map(|b| format!("{b:02x}")).collect()
    }
}
