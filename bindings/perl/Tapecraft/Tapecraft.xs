/* Tapecraft.xs — Perl binding over the tapecraft stable C ABI.
 *
 * Covers the table-free host-tier surface (hash / SHA-256 / bytesum /
 * fill_random / tokenize / UTF-8 decode+encode / pgram sort keys +
 * argsort).  The Unicode-table functions (fold / uncased find / unicode
 * sort keys) take caller-dumped UCD arrays and are reachable through the
 * same ABI; this consumer exercises the core set.
 *
 * Reference surface mirrored: rust/stringzilla.rs:938-1656 (hash, sha256,
 * bytesum), python/stringzilla.c module functions.
 */
#define PERL_NO_GET_CONTEXT
#include "EXTERN.h"
#include "perl.h"
#include "XSUB.h"

#include <stdint.h>
#include <stdlib.h>

/* Declarations from native/tapecraft.h (kept local so the XS compiles as
 * plain C without pulling the C++ header's comments along). */
int tc_version(void);
uint64_t tc_bytesum(const uint8_t* data, int64_t n);
uint64_t tc_hash(const uint8_t* data, int64_t n, uint64_t seed);
void tc_fill_random(uint8_t* out, int64_t n, uint64_t nonce);
void tc_sha256(const uint8_t* data, int64_t n, uint8_t* out32);
int64_t tc_tokenize_ws(const uint8_t* data, int64_t n, int64_t* bounds,
                       int64_t cap);
int64_t tc_split_lines(const uint8_t* data, int64_t n, int64_t* bounds,
                       int64_t cap);
int64_t tc_utf8_decode(const uint8_t* data, int64_t n, uint32_t* runes,
                       int32_t* offsets);
int64_t tc_utf8_encode(const uint32_t* runes, int64_t count, uint8_t* out);
void tc_pgram_keys(const uint8_t* data, const int64_t* starts,
                   const int64_t* ends, int64_t count, uint32_t* out,
                   int words_per_str, int uncased, int reverse);
void tc_argsort_keys(const uint32_t* keys, int64_t n, int32_t w,
                     int64_t* order);

MODULE = Tapecraft  PACKAGE = Tapecraft

PROTOTYPES: DISABLE

int
version()
    CODE:
        RETVAL = tc_version();
    OUTPUT:
        RETVAL

UV
bytesum(SV* data)
    CODE:
        STRLEN len;
        const char* p = SvPVbyte(data, len);
        RETVAL = (UV)tc_bytesum((const uint8_t*)p, (int64_t)len);
    OUTPUT:
        RETVAL

UV
hash(SV* data, UV seed)
    CODE:
        STRLEN len;
        const char* p = SvPVbyte(data, len);
        RETVAL = (UV)tc_hash((const uint8_t*)p, (int64_t)len, (uint64_t)seed);
    OUTPUT:
        RETVAL

SV*
sha256(SV* data)
    CODE:
        STRLEN len;
        const char* p = SvPVbyte(data, len);
        uint8_t digest[32];
        tc_sha256((const uint8_t*)p, (int64_t)len, digest);
        RETVAL = newSVpvn((const char*)digest, 32);
    OUTPUT:
        RETVAL

SV*
fill_random(UV n, UV nonce)
    CODE:
        SV* out = newSV((STRLEN)n);
        SvPOK_on(out);
        tc_fill_random((uint8_t*)SvPVX(out), (int64_t)n, (uint64_t)nonce);
        SvCUR_set(out, (STRLEN)n);
        RETVAL = out;
    OUTPUT:
        RETVAL

void
tokenize_ws(SV* data)
    PPCODE:
        STRLEN len;
        const char* p = SvPVbyte(data, len);
        int64_t count = tc_tokenize_ws((const uint8_t*)p, (int64_t)len,
                                       NULL, 0);
        if (count > 0) {
            int64_t* bounds = (int64_t*)malloc(2 * count * sizeof(int64_t));
            int64_t i;
            tc_tokenize_ws((const uint8_t*)p, (int64_t)len, bounds, count);
            EXTEND(SP, 2 * count);
            for (i = 0; i < count; i++) {
                mPUSHi((IV)bounds[2 * i]);
                mPUSHi((IV)bounds[2 * i + 1]);
            }
            free(bounds);
        }

void
utf8_decode(SV* data)
    PPCODE:
        /* Returns the list of decoded runes (U+FFFD per maximal subpart). */
        STRLEN len;
        const char* p = SvPVbyte(data, len);
        if (len > 0) {
            uint32_t* runes = (uint32_t*)malloc(len * sizeof(uint32_t));
            int32_t* offs = (int32_t*)malloc((len + 1) * sizeof(int32_t));
            int64_t n = tc_utf8_decode((const uint8_t*)p, (int64_t)len,
                                       runes, offs);
            int64_t i;
            EXTEND(SP, n);
            for (i = 0; i < n; i++)
                mPUSHu((UV)runes[i]);
            free(runes);
            free(offs);
        }

SV*
utf8_encode(AV* runes)
    CODE:
        SSize_t count = av_len(runes) + 1;
        uint32_t* r = (uint32_t*)malloc((count ? count : 1) * sizeof(uint32_t));
        SSize_t i;
        int64_t nbytes;
        SV* out;
        for (i = 0; i < count; i++) {
            SV** el = av_fetch(runes, i, 0);
            r[i] = el ? (uint32_t)SvUV(*el) : 0;
        }
        out = newSV((STRLEN)(4 * count + 1));
        SvPOK_on(out);
        nbytes = tc_utf8_encode(r, (int64_t)count, (uint8_t*)SvPVX(out));
        SvCUR_set(out, (STRLEN)nbytes);
        free(r);
        RETVAL = out;
    OUTPUT:
        RETVAL

void
argsort(AV* strings)
    PPCODE:
        /* Stable lexicographic argsort via pgram-key export + key sort —
         * the tc_pgram_keys/tc_argsort_keys pipeline (reference
         * sort.h:9-16 pgram export). */
        SSize_t count = av_len(strings) + 1;
        if (count > 0) {
            int words = 1; /* grown to cover the longest string below */
            STRLEN total = 0, pos = 0;
            SSize_t i;
            int64_t* starts = (int64_t*)malloc(count * sizeof(int64_t));
            int64_t* ends = (int64_t*)malloc(count * sizeof(int64_t));
            uint8_t* blob;
            uint32_t* keys;
            int64_t* order;
            for (i = 0; i < count; i++) {
                SV** el = av_fetch(strings, i, 0);
                STRLEN l;
                SvPVbyte(*el, l);
                total += l;
                if ((int)((l + 3) / 4) > words)
                    words = (int)((l + 3) / 4);
            }
            blob = (uint8_t*)malloc(total ? total : 1);
            for (i = 0; i < count; i++) {
                SV** el = av_fetch(strings, i, 0);
                STRLEN l;
                const char* s = SvPVbyte(*el, l);
                memcpy(blob + pos, s, l);
                starts[i] = (int64_t)pos;
                pos += l;
                ends[i] = (int64_t)pos;
            }
            keys = (uint32_t*)malloc(count * (words + 1) * sizeof(uint32_t));
            order = (int64_t*)malloc(count * sizeof(int64_t));
            tc_pgram_keys(blob, starts, ends, (int64_t)count, keys, words,
                          0, 0);
            tc_argsort_keys(keys, (int64_t)count, words + 1, order);
            EXTEND(SP, count);
            for (i = 0; i < count; i++)
                mPUSHi((IV)order[i]);
            free(order); free(keys); free(blob); free(ends); free(starts);
        }
