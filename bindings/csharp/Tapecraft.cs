// C# P/Invoke binding over the tapecraft stable C ABI — the analog of the
// reference's csharp/StringZilla.cs P/Invoke surface over its C99 ABI.
//
// Covers the host tier: hashing, SHA-256, PRNG fill, tokenization, UTF-8
// decode/encode, sort-key export + argsort.  Device work (batched edit
// distances, fingerprints, on-chip search) stays behind the Python engine
// API (see bindings/README.md).
//
// NOTE: compile-ready but NOT compiled in the repo's CI image (no .NET
// toolchain there); tests/test_bindings.py drift-checks the symbol usage.
// Ship libtapecraft.so next to the assembly or on LD_LIBRARY_PATH.

using System;
using System.Runtime.InteropServices;
using System.Text;

namespace Tapecraft
{
    public static class Native
    {
        private const string Lib = "tapecraft";

        [DllImport(Lib)] internal static extern int tc_version();
        [DllImport(Lib)] internal static extern ulong tc_bytesum(byte[] data, long n);
        [DllImport(Lib)] internal static extern ulong tc_hash(byte[] data, long n, ulong seed);
        [DllImport(Lib)] internal static extern void tc_hash_bounds(byte[] data, long[] starts, long[] ends, long count, ulong seed, ulong[] @out);
        [DllImport(Lib)] internal static extern void tc_fill_random(byte[] @out, long n, ulong nonce);
        [DllImport(Lib)] internal static extern void tc_sha256(byte[] data, long n, byte[] out32);
        [DllImport(Lib)] internal static extern void tc_sha256_compress(uint[] state, byte[] block, long nblocks);
        [DllImport(Lib)] internal static extern long tc_tokenize_ws(byte[] data, long n, long[] bounds, long cap);
        [DllImport(Lib)] internal static extern long tc_split_lines(byte[] data, long n, long[] bounds, long cap);
        [DllImport(Lib)] internal static extern long tc_utf8_decode(byte[] data, long n, uint[] runes, int[] offsets);
        [DllImport(Lib)] internal static extern long tc_utf8_encode(uint[] runes, long count, byte[] @out);
        [DllImport(Lib)] internal static extern void tc_pgram_keys(byte[] data, long[] starts, long[] ends, long count, uint[] @out, int wordsPerStr, int uncased, int reverse);
        [DllImport(Lib)] internal static extern void tc_argsort_keys(uint[] keys, long n, int w, long[] order);
    }

    /// <summary>Host-tier string kernels (hash/SHA-256/tokenize/UTF-8/sort).</summary>
    public static class Str
    {
        public static int Version() => Native.tc_version();

        /// <summary>Sum of all bytes (reference sz_bytesum, hash.h:110).</summary>
        public static ulong ByteSum(byte[] data) =>
            Native.tc_bytesum(data, data.LongLength);

        /// <summary>64-bit seeded hash, bit-identical to the reference contract.</summary>
        public static ulong Hash(byte[] data, ulong seed = 0) =>
            Native.tc_hash(data, data.LongLength, seed);

        /// <summary>One hash per (start, end) span of a shared buffer.</summary>
        public static ulong[] HashSpans(byte[] data, long[] starts, long[] ends, ulong seed = 0)
        {
            var result = new ulong[starts.Length];
            Native.tc_hash_bounds(data, starts, ends, starts.Length, seed, result);
            return result;
        }

        /// <summary>AES-CTR pseudo-random bytes, reproducible per nonce.</summary>
        public static byte[] FillRandom(long n, ulong nonce = 0)
        {
            var result = new byte[n];
            Native.tc_fill_random(result, n, nonce);
            return result;
        }

        /// <summary>FIPS 180-4 SHA-256 digest.</summary>
        public static byte[] Sha256(byte[] data)
        {
            var digest = new byte[32];
            Native.tc_sha256(data, data.LongLength, digest);
            return digest;
        }

        private static (long, long)[] Bounds(byte[] data, Func<byte[], long, long[], long, long> f)
        {
            long count = f(data, data.LongLength, null, 0);
            var flat = new long[2 * count];
            f(data, data.LongLength, flat, count);
            var spans = new (long, long)[count];
            for (long i = 0; i < count; i++)
                spans[i] = (flat[2 * i], flat[2 * i + 1]);
            return spans;
        }

        /// <summary>Whitespace-token (start, end) byte spans.</summary>
        public static (long, long)[] TokenizeWs(byte[] data) =>
            Bounds(data, Native.tc_tokenize_ws);

        /// <summary>Line (start, end) byte spans.</summary>
        public static (long, long)[] SplitLines(byte[] data) =>
            Bounds(data, Native.tc_split_lines);

        /// <summary>Decode UTF-8 to code points, U+FFFD per maximal subpart.</summary>
        public static uint[] Utf8Decode(byte[] data)
        {
            var runes = new uint[Math.Max(data.Length, 1)];
            var offs = new int[data.Length + 1];
            long n = Native.tc_utf8_decode(data, data.LongLength, runes, offs);
            Array.Resize(ref runes, (int)n);
            return runes;
        }

        /// <summary>Encode code points to UTF-8 bytes.</summary>
        public static byte[] Utf8Encode(uint[] runes)
        {
            var tmp = new byte[4 * runes.Length + 1];
            long n = Native.tc_utf8_encode(runes, runes.LongLength, tmp);
            Array.Resize(ref tmp, (int)n);
            return tmp;
        }

        /// <summary>Stable lexicographic argsort via the pgram-key export +
        /// MSD key sort pipeline (reference sort.h:9-16).</summary>
        public static long[] ArgSort(byte[][] items)
        {
            if (items.Length == 0) return Array.Empty<long>();
            long total = 0; int words = 1;
            var starts = new long[items.Length];
            var ends = new long[items.Length];
            foreach (var it in items)
            {
                total += it.Length;
                words = Math.Max(words, (it.Length + 3) / 4);
            }
            var blob = new byte[Math.Max(total, 1)];
            long pos = 0;
            for (int i = 0; i < items.Length; i++)
            {
                Array.Copy(items[i], 0, blob, pos, items[i].Length);
                starts[i] = pos;
                pos += items[i].Length;
                ends[i] = pos;
            }
            var keys = new uint[items.Length * (words + 1)];
            var order = new long[items.Length];
            Native.tc_pgram_keys(blob, starts, ends, items.Length, keys, words, 0, 0);
            Native.tc_argsort_keys(keys, items.Length, words + 1, order);
            return order;
        }

        public static long[] ArgSort(string[] items)
        {
            var bytes = new byte[items.Length][];
            for (int i = 0; i < items.Length; i++)
                bytes[i] = Encoding.UTF8.GetBytes(items[i]);
            return ArgSort(bytes);
        }
    }
}
