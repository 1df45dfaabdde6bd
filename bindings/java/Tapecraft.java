// Java binding over the tapecraft stable C ABI via the Foreign Function &
// Memory API (JEP 454, Java 22+) — the analog of the reference's
// java/.../StringZilla.java JNI surface, without the JNI glue layer.
//
// Covers the host tier: hashing, SHA-256, PRNG fill, tokenization, UTF-8
// decode/encode, sort-key export + argsort.  Device work stays behind the
// Python engine API (see bindings/README.md).
//
// NOTE: compile-ready but NOT compiled in the repo's CI image (no JDK
// there); tests/test_bindings.py drift-checks the symbol usage.
// Run with: java --enable-native-access=ALL-UNNAMED -Djava.library.path=...

package tapecraft;

import java.lang.foreign.Arena;
import java.lang.foreign.FunctionDescriptor;
import java.lang.foreign.Linker;
import java.lang.foreign.MemorySegment;
import java.lang.foreign.SymbolLookup;
import java.lang.foreign.ValueLayout;
import java.lang.invoke.MethodHandle;
import java.nio.charset.StandardCharsets;

public final class Tapecraft {
    private static final Linker LINKER = Linker.nativeLinker();
    private static final SymbolLookup LIB =
        SymbolLookup.libraryLookup("tapecraft", Arena.global());

    private static MethodHandle handle(String name, FunctionDescriptor desc) {
        return LINKER.downcallHandle(LIB.find(name).orElseThrow(
            () -> new UnsatisfiedLinkError(name)), desc);
    }

    private static final MethodHandle TC_VERSION = handle("tc_version",
        FunctionDescriptor.of(ValueLayout.JAVA_INT));
    private static final MethodHandle TC_BYTESUM = handle("tc_bytesum",
        FunctionDescriptor.of(ValueLayout.JAVA_LONG, ValueLayout.ADDRESS,
            ValueLayout.JAVA_LONG));
    private static final MethodHandle TC_HASH = handle("tc_hash",
        FunctionDescriptor.of(ValueLayout.JAVA_LONG, ValueLayout.ADDRESS,
            ValueLayout.JAVA_LONG, ValueLayout.JAVA_LONG));
    private static final MethodHandle TC_HASH_BOUNDS = handle("tc_hash_bounds",
        FunctionDescriptor.ofVoid(ValueLayout.ADDRESS, ValueLayout.ADDRESS,
            ValueLayout.ADDRESS, ValueLayout.JAVA_LONG, ValueLayout.JAVA_LONG,
            ValueLayout.ADDRESS));
    private static final MethodHandle TC_FILL_RANDOM = handle("tc_fill_random",
        FunctionDescriptor.ofVoid(ValueLayout.ADDRESS, ValueLayout.JAVA_LONG,
            ValueLayout.JAVA_LONG));
    private static final MethodHandle TC_SHA256 = handle("tc_sha256",
        FunctionDescriptor.ofVoid(ValueLayout.ADDRESS, ValueLayout.JAVA_LONG,
            ValueLayout.ADDRESS));
    private static final MethodHandle TC_TOKENIZE_WS = handle("tc_tokenize_ws",
        FunctionDescriptor.of(ValueLayout.JAVA_LONG, ValueLayout.ADDRESS,
            ValueLayout.JAVA_LONG, ValueLayout.ADDRESS, ValueLayout.JAVA_LONG));
    private static final MethodHandle TC_SPLIT_LINES = handle("tc_split_lines",
        FunctionDescriptor.of(ValueLayout.JAVA_LONG, ValueLayout.ADDRESS,
            ValueLayout.JAVA_LONG, ValueLayout.ADDRESS, ValueLayout.JAVA_LONG));
    private static final MethodHandle TC_UTF8_DECODE = handle("tc_utf8_decode",
        FunctionDescriptor.of(ValueLayout.JAVA_LONG, ValueLayout.ADDRESS,
            ValueLayout.JAVA_LONG, ValueLayout.ADDRESS, ValueLayout.ADDRESS));
    private static final MethodHandle TC_UTF8_ENCODE = handle("tc_utf8_encode",
        FunctionDescriptor.of(ValueLayout.JAVA_LONG, ValueLayout.ADDRESS,
            ValueLayout.JAVA_LONG, ValueLayout.ADDRESS));
    private static final MethodHandle TC_PGRAM_KEYS = handle("tc_pgram_keys",
        FunctionDescriptor.ofVoid(ValueLayout.ADDRESS, ValueLayout.ADDRESS,
            ValueLayout.ADDRESS, ValueLayout.JAVA_LONG, ValueLayout.ADDRESS,
            ValueLayout.JAVA_INT, ValueLayout.JAVA_INT, ValueLayout.JAVA_INT));
    private static final MethodHandle TC_ARGSORT_KEYS = handle("tc_argsort_keys",
        FunctionDescriptor.ofVoid(ValueLayout.ADDRESS, ValueLayout.JAVA_LONG,
            ValueLayout.JAVA_INT, ValueLayout.ADDRESS));

    private Tapecraft() {}

    /** ABI version of the linked libtapecraft. */
    public static int version() {
        try { return (int) TC_VERSION.invokeExact(); }
        catch (Throwable t) { throw new RuntimeException(t); }
    }

    /** Sum of all bytes (reference sz_bytesum, hash.h:110). */
    public static long byteSum(byte[] data) {
        try (Arena arena = Arena.ofConfined()) {
            MemorySegment seg = arena.allocateFrom(ValueLayout.JAVA_BYTE, data);
            return (long) TC_BYTESUM.invokeExact(seg, (long) data.length);
        } catch (Throwable t) { throw new RuntimeException(t); }
    }

    /** 64-bit seeded hash, bit-identical to the reference contract. */
    public static long hash(byte[] data, long seed) {
        try (Arena arena = Arena.ofConfined()) {
            MemorySegment seg = arena.allocateFrom(ValueLayout.JAVA_BYTE, data);
            return (long) TC_HASH.invokeExact(seg, (long) data.length, seed);
        } catch (Throwable t) { throw new RuntimeException(t); }
    }

    /** One hash per (start, end) span of a shared buffer. */
    public static long[] hashSpans(byte[] data, long[] starts, long[] ends,
                                   long seed) {
        try (Arena arena = Arena.ofConfined()) {
            MemorySegment d = arena.allocateFrom(ValueLayout.JAVA_BYTE, data);
            MemorySegment s = arena.allocateFrom(ValueLayout.JAVA_LONG, starts);
            MemorySegment e = arena.allocateFrom(ValueLayout.JAVA_LONG, ends);
            MemorySegment out = arena.allocate(ValueLayout.JAVA_LONG, starts.length);
            TC_HASH_BOUNDS.invokeExact(d, s, e, (long) starts.length, seed, out);
            return out.toArray(ValueLayout.JAVA_LONG);
        } catch (Throwable t) { throw new RuntimeException(t); }
    }

    /** AES-CTR pseudo-random bytes, reproducible per nonce. */
    public static byte[] fillRandom(long n, long nonce) {
        try (Arena arena = Arena.ofConfined()) {
            MemorySegment out = arena.allocate(n);
            TC_FILL_RANDOM.invokeExact(out, n, nonce);
            return out.toArray(ValueLayout.JAVA_BYTE);
        } catch (Throwable t) { throw new RuntimeException(t); }
    }

    /** FIPS 180-4 SHA-256 digest. */
    public static byte[] sha256(byte[] data) {
        try (Arena arena = Arena.ofConfined()) {
            MemorySegment seg = arena.allocateFrom(ValueLayout.JAVA_BYTE, data);
            MemorySegment out = arena.allocate(32);
            TC_SHA256.invokeExact(seg, (long) data.length, out);
            return out.toArray(ValueLayout.JAVA_BYTE);
        } catch (Throwable t) { throw new RuntimeException(t); }
    }

    private static long[] bounds(byte[] data, MethodHandle f) {
        try (Arena arena = Arena.ofConfined()) {
            MemorySegment seg = arena.allocateFrom(ValueLayout.JAVA_BYTE, data);
            long count = (long) f.invokeExact(seg, (long) data.length,
                                              MemorySegment.NULL, 0L);
            MemorySegment out = arena.allocate(ValueLayout.JAVA_LONG, 2 * count);
            long unused = (long) f.invokeExact(seg, (long) data.length, out, count);
            return out.toArray(ValueLayout.JAVA_LONG);
        } catch (Throwable t) { throw new RuntimeException(t); }
    }

    /** Whitespace-token spans as a flat [s0, e0, s1, e1, ...] array. */
    public static long[] tokenizeWs(byte[] data) {
        return bounds(data, TC_TOKENIZE_WS);
    }

    /** Line spans as a flat [s0, e0, s1, e1, ...] array. */
    public static long[] splitLines(byte[] data) {
        return bounds(data, TC_SPLIT_LINES);
    }

    /** Decode UTF-8 to code points, U+FFFD per maximal subpart. */
    public static int[] utf8Decode(byte[] data) {
        try (Arena arena = Arena.ofConfined()) {
            MemorySegment seg = arena.allocateFrom(ValueLayout.JAVA_BYTE, data);
            MemorySegment runes = arena.allocate(ValueLayout.JAVA_INT,
                                                 Math.max(data.length, 1));
            MemorySegment offs = arena.allocate(ValueLayout.JAVA_INT,
                                                data.length + 1);
            long n = (long) TC_UTF8_DECODE.invokeExact(seg, (long) data.length,
                                                       runes, offs);
            return runes.asSlice(0, n * 4).toArray(ValueLayout.JAVA_INT);
        } catch (Throwable t) { throw new RuntimeException(t); }
    }

    /** Encode code points to UTF-8 bytes. */
    public static byte[] utf8Encode(int[] runes) {
        try (Arena arena = Arena.ofConfined()) {
            MemorySegment in = arena.allocateFrom(ValueLayout.JAVA_INT, runes);
            MemorySegment out = arena.allocate(4L * runes.length + 1);
            long n = (long) TC_UTF8_ENCODE.invokeExact(in, (long) runes.length,
                                                       out);
            return out.asSlice(0, n).toArray(ValueLayout.JAVA_BYTE);
        } catch (Throwable t) { throw new RuntimeException(t); }
    }

    /** Stable lexicographic argsort via the pgram-key export + MSD key sort
     *  pipeline (reference sort.h:9-16). */
    public static long[] argSort(String[] items) {
        byte[][] bytes = new byte[items.length][];
        for (int i = 0; i < items.length; i++)
            bytes[i] = items[i].getBytes(StandardCharsets.UTF_8);
        return argSort(bytes);
    }

    public static long[] argSort(byte[][] items) {
        if (items.length == 0) return new long[0];
        long total = 0;
        int words = 1;
        for (byte[] it : items) {
            total += it.length;
            words = Math.max(words, (it.length + 3) / 4);
        }
        try (Arena arena = Arena.ofConfined()) {
            MemorySegment blob = arena.allocate(Math.max(total, 1));
            long[] starts = new long[items.length];
            long[] ends = new long[items.length];
            long pos = 0;
            for (int i = 0; i < items.length; i++) {
                MemorySegment.copy(items[i], 0, blob, ValueLayout.JAVA_BYTE,
                                   pos, items[i].length);
                starts[i] = pos;
                pos += items[i].length;
                ends[i] = pos;
            }
            MemorySegment s = arena.allocateFrom(ValueLayout.JAVA_LONG, starts);
            MemorySegment e = arena.allocateFrom(ValueLayout.JAVA_LONG, ends);
            MemorySegment keys = arena.allocate(ValueLayout.JAVA_INT,
                                                (long) items.length * (words + 1));
            MemorySegment order = arena.allocate(ValueLayout.JAVA_LONG,
                                                 items.length);
            TC_PGRAM_KEYS.invokeExact(blob, s, e, (long) items.length, keys,
                                      words, 0, 0);
            TC_ARGSORT_KEYS.invokeExact(keys, (long) items.length, words + 1,
                                        order);
            return order.toArray(ValueLayout.JAVA_LONG);
        } catch (Throwable t) { throw new RuntimeException(t); }
    }
}
