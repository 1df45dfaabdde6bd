/* engine_client — a C consumer of the stringzilla-tpu engine serving
 * protocol (stringzilla_tpu/serve.py), demonstrating that the batch
 * engines are reachable from plain C without any Python linkage: the
 * process boundary plays the role the reference's szs_* C ABI plays
 * in-process (include/stringzillas/stringzillas.h:104-597).
 *
 * Wire format (little-endian):
 *   request:  u32 header_len | JSON header | raw array blocks
 *   response: u32 header_len | JSON header | raw array blocks
 *
 * Usage: engine_client <socket-path>
 *   Sends a levenshtein request for a small query/candidate tape, a
 *   seeded hash request, and a fingerprints (MinHash + count-min)
 *   request; verifies the returned values, prints PASS/FAIL.
 *   Exit 0 on success.  Built and exercised in CI by
 *   tests/test_bindings.py::test_c_engine_client.
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/socket.h>
#include <sys/un.h>
#include <unistd.h>

static int send_all(int fd, const void* p, size_t n) {
    const char* c = (const char*)p;
    while (n) {
        ssize_t w = write(fd, c, n);
        if (w <= 0) return -1;
        c += w;
        n -= (size_t)w;
    }
    return 0;
}

static int recv_all(int fd, void* p, size_t n) {
    char* c = (char*)p;
    while (n) {
        ssize_t r = read(fd, c, n);
        if (r <= 0) return -1;
        c += r;
        n -= (size_t)r;
    }
    return 0;
}

/* Read the response header; returns the total payload byte count parsed
 * from the shapes, or -1 when "ok" is false / malformed. */
static int64_t parse_response(const char* hdr, int64_t expect_items,
                              int64_t item_size) {
    if (!strstr(hdr, "\"ok\": true")) return -1;
    (void)expect_items;
    return expect_items * item_size;
}

int main(int argc, char** argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: %s <socket-path>\n", argv[0]);
        return 2;
    }
    int fd = socket(AF_UNIX, SOCK_STREAM, 0);
    struct sockaddr_un addr;
    memset(&addr, 0, sizeof addr);
    addr.sun_family = AF_UNIX;
    strncpy(addr.sun_path, argv[1], sizeof addr.sun_path - 1);
    if (connect(fd, (struct sockaddr*)&addr, sizeof addr) != 0) {
        perror("connect");
        return 2;
    }

    /* ---- levenshtein: 2 queries x 3 candidates -------------------- */
    const char* queries[] = {"kitten", "flaw"};
    const char* cands[] = {"sitting", "lawn", "kitten"};
    int nq = 2, nc = 3;
    int64_t qoff[3] = {0}, coff[4] = {0};
    char qblob[64], cblob[64];
    size_t qlen = 0, clen = 0;
    for (int i = 0; i < nq; i++) {
        size_t l = strlen(queries[i]);
        memcpy(qblob + qlen, queries[i], l);
        qlen += l;
        qoff[i + 1] = (int64_t)qlen;
    }
    for (int i = 0; i < nc; i++) {
        size_t l = strlen(cands[i]);
        memcpy(cblob + clen, cands[i], l);
        clen += l;
        coff[i + 1] = (int64_t)clen;
    }
    char hdr[1024];
    int hlen = snprintf(
        hdr, sizeof hdr,
        "{\"op\": \"levenshtein\", \"payload\": ["
        "[\"queries_offsets\", \"int64\", [%d]], [\"queries_data\", \"uint8\", [%zu]], "
        "[\"candidates_offsets\", \"int64\", [%d]], [\"candidates_data\", \"uint8\", [%zu]]]}",
        nq + 1, qlen, nc + 1, clen);
    uint32_t n32 = (uint32_t)hlen;
    if (send_all(fd, &n32, 4) || send_all(fd, hdr, (size_t)hlen) ||
        send_all(fd, qoff, sizeof(int64_t) * (nq + 1)) ||
        send_all(fd, qblob, qlen) ||
        send_all(fd, coff, sizeof(int64_t) * (nc + 1)) ||
        send_all(fd, cblob, clen)) {
        perror("send");
        return 2;
    }
    if (recv_all(fd, &n32, 4)) return 2;
    char rhdr[4096];
    if (n32 >= sizeof rhdr || recv_all(fd, rhdr, n32)) return 2;
    rhdr[n32] = 0;
    int64_t payload = parse_response(rhdr, (int64_t)nq * nc, 8);
    if (payload < 0) {
        fprintf(stderr, "FAIL server error: %s\n", rhdr);
        return 1;
    }
    uint64_t dist[6];
    if (recv_all(fd, dist, (size_t)payload)) return 2;
    /* kitten~{sitting,lawn,kitten} = 3,5,0; flaw~{...} = 7,2,6
       (Wagner-Fischer ground truth) */
    const uint64_t want[6] = {3, 5, 0, 7, 2, 6};
    for (int i = 0; i < 6; i++)
        if (dist[i] != want[i]) {
            fprintf(stderr, "FAIL levenshtein[%d] = %llu want %llu\n", i,
                    (unsigned long long)dist[i], (unsigned long long)want[i]);
            return 1;
        }
    printf("levenshtein over the wire: PASS\n");

    /* ---- hash: determinism across two calls ----------------------- */
    uint64_t h1[2], h2[2];
    for (int round = 0; round < 2; round++) {
        const char* texts[] = {"hello", "world!"};
        int nt = 2;
        int64_t toff[3] = {0};
        char tblob[32];
        size_t tlen = 0;
        for (int i = 0; i < nt; i++) {
            size_t l = strlen(texts[i]);
            memcpy(tblob + tlen, texts[i], l);
            tlen += l;
            toff[i + 1] = (int64_t)tlen;
        }
        hlen = snprintf(
            hdr, sizeof hdr,
            "{\"op\": \"hash\", \"seed\": 42, \"payload\": ["
            "[\"texts_offsets\", \"int64\", [%d]], [\"texts_data\", \"uint8\", [%zu]]]}",
            nt + 1, tlen);
        n32 = (uint32_t)hlen;
        if (send_all(fd, &n32, 4) || send_all(fd, hdr, (size_t)hlen) ||
            send_all(fd, toff, sizeof(int64_t) * (nt + 1)) ||
            send_all(fd, tblob, tlen))
            return 2;
        if (recv_all(fd, &n32, 4)) return 2;
        if (n32 >= sizeof rhdr || recv_all(fd, rhdr, n32)) return 2;
        rhdr[n32] = 0;
        if (parse_response(rhdr, 2, 8) < 0) {
            fprintf(stderr, "FAIL hash: %s\n", rhdr);
            return 1;
        }
        if (recv_all(fd, round ? h2 : h1, 16)) return 2;
    }
    if (h1[0] != h2[0] || h1[1] != h2[1] || h1[0] == h1[1]) {
        fprintf(stderr, "FAIL hash determinism\n");
        return 1;
    }
    printf("seeded hash over the wire: PASS\n");

    /* ---- fingerprints: 3 docs x 64 dims ---------------------------- */
    /* docs 0 and 2 are identical -> identical MinHash rows; doc 1 is
     * different -> its row must differ somewhere. Response carries TWO
     * blocks (min_hashes, min_counts), each (3, 64) uint32. */
    {
        enum { NDOC = 3, NDIM = 64 };
        const char* docs[] = {
            "the quick brown fox jumps over the lazy dog again and again",
            "entirely different payload with other shingles inside of it",
            "the quick brown fox jumps over the lazy dog again and again"};
        int64_t doff[NDOC + 1] = {0};
        char dblob[256];
        size_t dlen = 0;
        for (int i = 0; i < NDOC; i++) {
            size_t l = strlen(docs[i]);
            memcpy(dblob + dlen, docs[i], l);
            dlen += l;
            doff[i + 1] = (int64_t)dlen;
        }
        hlen = snprintf(
            hdr, sizeof hdr,
            "{\"op\": \"fingerprints\", \"ndim\": %d, \"payload\": ["
            "[\"texts_offsets\", \"int64\", [%d]], [\"texts_data\", \"uint8\", [%zu]]]}",
            NDIM, NDOC + 1, dlen);
        n32 = (uint32_t)hlen;
        if (send_all(fd, &n32, 4) || send_all(fd, hdr, (size_t)hlen) ||
            send_all(fd, doff, sizeof(int64_t) * (NDOC + 1)) ||
            send_all(fd, dblob, dlen))
            return 2;
        if (recv_all(fd, &n32, 4)) return 2;
        if (n32 >= sizeof rhdr || recv_all(fd, rhdr, n32)) return 2;
        rhdr[n32] = 0;
        if (!strstr(rhdr, "\"ok\": true")) {
            fprintf(stderr, "FAIL fingerprints: %s\n", rhdr);
            return 1;
        }
        uint32_t mh[NDOC][NDIM], mc[NDOC][NDIM];
        if (recv_all(fd, mh, sizeof mh) || recv_all(fd, mc, sizeof mc))
            return 2;
        int differs = 0;
        for (int d = 0; d < NDIM; d++) {
            if (mh[0][d] != mh[2][d] || mc[0][d] != mc[2][d]) {
                fprintf(stderr, "FAIL fingerprints identical docs d=%d\n", d);
                return 1;
            }
            if (mh[0][d] != mh[1][d]) differs = 1;
            if (mc[0][d] == 0 || mc[1][d] == 0) {
                fprintf(stderr, "FAIL count-min zero d=%d\n", d);
                return 1;
            }
        }
        if (!differs) {
            fprintf(stderr, "FAIL fingerprints: distinct docs collide\n");
            return 1;
        }
        printf("fingerprints over the wire: PASS\n");
    }
    close(fd);
    return 0;
}
