"""The native runtime's C ABI (tapecraft.h) — proven by an actual foreign
consumer: a C program compiled against the header and linked to the same
shared library the Python package builds (the analog of the reference's
binding test strategy: every binding validated against the C core)."""

import os
import subprocess

import numpy as np
import pytest

from stringzilla_tpu.utils import native

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "stringzilla_tpu", "native")

C_CONSUMER = r"""
#include <stdio.h>
#include <string.h>
#include "tapecraft.h"

int main(void) {
    if (tc_version() < 3) { puts("BAD version"); return 1; }

    const char* text = "hello TPU world";
    unsigned long long s = tc_bytesum((const uint8_t*)text, 15);
    unsigned long long want = 0;
    for (int i = 0; i < 15; ++i) want += (unsigned char)text[i];
    if (s != want) { puts("BAD bytesum"); return 1; }

    int64_t bounds[8];
    int64_t ntok = tc_tokenize_ws((const uint8_t*)text, 15, bounds, 4);
    if (ntok != 3 || bounds[0] != 0 || bounds[1] != 5) {
        puts("BAD tokenize"); return 1;
    }

    /* tape pack: two strings into a 2x8 matrix */
    const uint8_t blob[] = "abcdefgh";
    int64_t offs[3] = {0, 3, 8};
    uint8_t mat[16];
    memset(mat, 0xAA, sizeof mat);
    tc_pack_u8(blob, offs, NULL, 2, mat, 2, 8, 0);
    if (mat[0] != 'a' || mat[3] != 0 || mat[8] != 'd' || mat[12] != 'h') {
        puts("BAD pack"); return 1;
    }

    uint32_t runes[16];
    int32_t roffs[17];
    int64_t nr = tc_utf8_decode((const uint8_t*)"a\xC3\xA9z", 4, runes, roffs);
    if (nr != 3 || runes[1] != 0xE9 || roffs[2] != 3) {
        puts("BAD decode"); return 1;
    }
    puts("C ABI OK");
    return 0;
}
"""


@pytest.mark.skipif(not native.available(), reason="native library unavailable")
def test_c_consumer(tmp_path):
    so = native._build()
    src = tmp_path / "consumer.c"
    src.write_text(C_CONSUMER)
    exe = tmp_path / "consumer"
    subprocess.run(
        ["g++", "-x", "c", str(src), "-x", "none", "-I", NATIVE_DIR, str(so),
         "-o", str(exe)],
        check=True, capture_output=True, timeout=120)
    out = subprocess.run([str(exe)], capture_output=True, text=True,
                         timeout=60, env={**os.environ})
    assert out.returncode == 0, out.stdout + out.stderr
    assert "C ABI OK" in out.stdout


def test_header_covers_every_export():
    """Every extern-C symbol in tapecraft.cpp is declared in tapecraft.h."""
    cpp = open(os.path.join(NATIVE_DIR, "tapecraft.cpp")).read()
    hdr = open(os.path.join(NATIVE_DIR, "tapecraft.h")).read()
    import re

    body = cpp.split('extern "C"', 1)[1]
    # Any identifier-soup return type (incl. pointers): "unsigned long *" etc.
    # `static` definitions are internal helpers, not ABI exports.
    for m in re.finditer(r"^(?!static\b)[A-Za-z_][\w ]*?\s*\*?\s*\b(tc_\w+)\s*\(",
                         body, re.M):
        assert m.group(1) in hdr, f"{m.group(1)} missing from tapecraft.h"
