// Package tapecraft binds the stringzilla-tpu host-runtime C ABI
// (native/tapecraft.h) via cgo — the analog of the reference's Go binding
// (golang/lib.go) over its C99 ABI.
//
// Build: place libtapecraft.so on the linker path (or compile
// tapecraft.cpp into a static archive) and `go build`.  This package is
// compile-ready but NOT compiled in the repo's CI image (no Go toolchain
// there); tests/test_bindings.py keeps its symbol usage in sync with the
// header instead.
package tapecraft

/*
#cgo LDFLAGS: -ltapecraft
#include <stdint.h>
#include <stdlib.h>

int tc_version(void);
uint64_t tc_bytesum(const uint8_t* data, int64_t n);
uint64_t tc_hash(const uint8_t* data, int64_t n, uint64_t seed);
void tc_fill_random(uint8_t* out, int64_t n, uint64_t nonce);
void tc_sha256(const uint8_t* data, int64_t n, uint8_t* out32);
void tc_sha256_compress(uint32_t* state, const uint8_t* block, int64_t nblocks);
int64_t tc_tokenize_ws(const uint8_t* data, int64_t n, int64_t* bounds, int64_t cap);
int64_t tc_split_lines(const uint8_t* data, int64_t n, int64_t* bounds, int64_t cap);
int64_t tc_utf8_decode(const uint8_t* data, int64_t n, uint32_t* runes, int32_t* offsets);
int64_t tc_utf8_encode(const uint32_t* runes, int64_t count, uint8_t* out);
void tc_pgram_keys(const uint8_t* data, const int64_t* starts, const int64_t* ends,
                   int64_t count, uint32_t* out, int words_per_str, int uncased, int reverse);
void tc_argsort_keys(const uint32_t* keys, int64_t n, int32_t w, int64_t* order);
*/
import "C"

import "unsafe"

func bytesPtr(b []byte) *C.uint8_t {
	if len(b) == 0 {
		return nil
	}
	return (*C.uint8_t)(unsafe.Pointer(&b[0]))
}

// Version reports the ABI version of the linked libtapecraft.
func Version() int { return int(C.tc_version()) }

// Bytesum sums all bytes (reference sz_bytesum, hash.h:110).
func Bytesum(data []byte) uint64 {
	return uint64(C.tc_bytesum(bytesPtr(data), C.int64_t(len(data))))
}

// Hash is the 64-bit seeded hash, bit-identical to the reference sz_hash.
func Hash(data []byte, seed uint64) uint64 {
	return uint64(C.tc_hash(bytesPtr(data), C.int64_t(len(data)), C.uint64_t(seed)))
}

// FillRandom returns n AES-CTR pseudo-random bytes, reproducible per nonce.
func FillRandom(n int, nonce uint64) []byte {
	out := make([]byte, n)
	C.tc_fill_random(bytesPtr(out), C.int64_t(n), C.uint64_t(nonce))
	return out
}

// Sha256 computes the FIPS 180-4 digest.
func Sha256(data []byte) [32]byte {
	var out [32]byte
	C.tc_sha256(bytesPtr(data), C.int64_t(len(data)), (*C.uint8_t)(unsafe.Pointer(&out[0])))
	return out
}

// Sha256Compress advances the 8-word streaming state over 64-byte blocks.
func Sha256Compress(state *[8]uint32, blocks []byte) {
	if len(blocks)%64 != 0 {
		panic("blocks must be a multiple of 64 bytes")
	}
	C.tc_sha256_compress((*C.uint32_t)(unsafe.Pointer(&state[0])),
		bytesPtr(blocks), C.int64_t(len(blocks)/64))
}

func boundsCall(f func(*C.uint8_t, C.int64_t, *C.int64_t, C.int64_t) C.int64_t,
	data []byte) [][2]int64 {
	n := f(bytesPtr(data), C.int64_t(len(data)), nil, 0)
	if n == 0 {
		return nil
	}
	raw := make([]int64, 2*n)
	f(bytesPtr(data), C.int64_t(len(data)),
		(*C.int64_t)(unsafe.Pointer(&raw[0])), n)
	out := make([][2]int64, n)
	for i := range out {
		out[i] = [2]int64{raw[2*i], raw[2*i+1]}
	}
	return out
}

// TokenizeWS returns whitespace-token (start, end) byte spans.
func TokenizeWS(data []byte) [][2]int64 {
	return boundsCall(func(d *C.uint8_t, n C.int64_t, b *C.int64_t, cap C.int64_t) C.int64_t {
		return C.tc_tokenize_ws(d, n, b, cap)
	}, data)
}

// SplitLines returns line (start, end) byte spans.
func SplitLines(data []byte) [][2]int64 {
	return boundsCall(func(d *C.uint8_t, n C.int64_t, b *C.int64_t, cap C.int64_t) C.int64_t {
		return C.tc_split_lines(d, n, b, cap)
	}, data)
}

// Utf8Decode decodes to scalar runes, U+FFFD per maximal subpart.
func Utf8Decode(data []byte) []uint32 {
	if len(data) == 0 {
		return nil
	}
	runes := make([]uint32, len(data))
	offs := make([]int32, len(data)+1)
	n := C.tc_utf8_decode(bytesPtr(data), C.int64_t(len(data)),
		(*C.uint32_t)(unsafe.Pointer(&runes[0])),
		(*C.int32_t)(unsafe.Pointer(&offs[0])))
	return runes[:n]
}

// Utf8Encode encodes scalar runes to UTF-8 bytes.
func Utf8Encode(runes []uint32) []byte {
	if len(runes) == 0 {
		return nil
	}
	out := make([]byte, 4*len(runes))
	n := C.tc_utf8_encode((*C.uint32_t)(unsafe.Pointer(&runes[0])),
		C.int64_t(len(runes)), bytesPtr(out))
	return out[:n]
}

// Argsort returns the stable lexicographic permutation of a string
// collection via the pgram-key export + MSD key sort ABI pipeline
// (reference sort.h:9-16).
func Argsort(items [][]byte) []int64 {
	if len(items) == 0 {
		return nil
	}
	var blob []byte
	starts := make([]int64, len(items))
	ends := make([]int64, len(items))
	words := 1
	for i, it := range items {
		starts[i] = int64(len(blob))
		blob = append(blob, it...)
		ends[i] = int64(len(blob))
		if w := (len(it) + 3) / 4; w > words {
			words = w
		}
	}
	keys := make([]uint32, len(items)*(words+1))
	order := make([]int64, len(items))
	C.tc_pgram_keys(bytesPtr(blob), (*C.int64_t)(unsafe.Pointer(&starts[0])),
		(*C.int64_t)(unsafe.Pointer(&ends[0])), C.int64_t(len(items)),
		(*C.uint32_t)(unsafe.Pointer(&keys[0])), C.int(words), 0, 0)
	C.tc_argsort_keys((*C.uint32_t)(unsafe.Pointer(&keys[0])),
		C.int64_t(len(items)), C.int32_t(words+1),
		(*C.int64_t)(unsafe.Pointer(&order[0])))
	return order
}
