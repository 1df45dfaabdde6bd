/* EngineClient — a pure-JVM consumer of the stringzilla-tpu engine serving
 * protocol (stringzilla_tpu/serve.py). No C toolchain, no JNI/FFM: the wire
 * is a Unix-domain socket (JDK 16+ java.net.UnixDomainSocketAddress) carrying
 * little-endian length-prefixed JSON headers + raw array blocks — the
 * process-boundary analog of the reference's szs_* engine C ABI
 * (include/stringzillas/stringzillas.h:104-597), reachable from any managed
 * runtime with sockets.
 *
 * STATUS: real, compilable source; the CI image has no JDK, so this client
 * is drift-checked structurally (tests/test_bindings.py) rather than run.
 * The byte-level protocol it speaks IS run in CI by the compiled C client
 * (bindings/c/engine_client.c) and the Python fuzz suite (tests/test_serve.py).
 *
 * Usage:  java EngineClient /tmp/stringzilla_tpu.sock
 * Sends a levenshtein request (2 queries x 3 candidates), a seeded hash
 * request, and a fingerprints request; verifies results; exits 0 on success.
 */
import java.io.IOException;
import java.net.StandardProtocolFamily;
import java.net.UnixDomainSocketAddress;
import java.nio.ByteBuffer;
import java.nio.ByteOrder;
import java.nio.channels.SocketChannel;
import java.nio.charset.StandardCharsets;
import java.util.ArrayList;
import java.util.List;

public final class EngineClient {

    private final SocketChannel chan;

    public EngineClient(String socketPath) throws IOException {
        chan = SocketChannel.open(StandardProtocolFamily.UNIX);
        chan.connect(UnixDomainSocketAddress.of(socketPath));
    }

    // ---- wire helpers ----------------------------------------------------

    private void writeAll(ByteBuffer buf) throws IOException {
        while (buf.hasRemaining()) chan.write(buf);
    }

    private ByteBuffer readExact(int n) throws IOException {
        ByteBuffer buf = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN);
        while (buf.hasRemaining())
            if (chan.read(buf) < 0) throw new IOException("peer closed");
        buf.flip();
        return buf;
    }

    /** One tape block pair: <name>_offsets (int64[n+1]) + <name>_data (u8). */
    static final class Tape {
        final String name;
        final long[] offsets;
        final byte[] data;

        Tape(String name, String[] items) {
            this.name = name;
            offsets = new long[items.length + 1];
            int total = 0;
            byte[][] raw = new byte[items.length][];
            for (int i = 0; i < items.length; i++) {
                raw[i] = items[i].getBytes(StandardCharsets.UTF_8);
                total += raw[i].length;
                offsets[i + 1] = total;
            }
            data = new byte[total];
            int pos = 0;
            for (byte[] r : raw) {
                System.arraycopy(r, 0, data, pos, r.length);
                pos += r.length;
            }
        }

        String payloadEntries() {
            return String.format(
                "[\"%s_offsets\", \"int64\", [%d]], [\"%s_data\", \"uint8\", [%d]]",
                name, offsets.length, name, data.length);
        }
    }

    /** Send one request; return the raw response blocks (header shapes are
     *  parsed just enough to size the reads — the server echoes dtypes). */
    List<ByteBuffer> call(String op, String extraParams, Tape... tapes)
            throws IOException {
        StringBuilder payload = new StringBuilder();
        for (Tape t : tapes) {
            if (payload.length() > 0) payload.append(", ");
            payload.append(t.payloadEntries());
        }
        String header = String.format("{\"op\": \"%s\"%s, \"payload\": [%s]}",
                op, extraParams, payload);
        byte[] raw = header.getBytes(StandardCharsets.UTF_8);
        ByteBuffer out = ByteBuffer.allocate(4 + raw.length)
                .order(ByteOrder.LITTLE_ENDIAN);
        out.putInt(raw.length).put(raw).flip();
        writeAll(out);
        for (Tape t : tapes) {
            ByteBuffer offs = ByteBuffer.allocate(8 * t.offsets.length)
                    .order(ByteOrder.LITTLE_ENDIAN);
            for (long v : t.offsets) offs.putLong(v);
            offs.flip();
            writeAll(offs);
            writeAll(ByteBuffer.wrap(t.data));
        }
        int hlen = readExact(4).getInt();
        String resp = new String(readExact(hlen).array(), 0, hlen,
                StandardCharsets.UTF_8);
        if (!resp.contains("\"ok\": true"))
            throw new IOException("server error: " + resp);
        List<ByteBuffer> blocks = new ArrayList<>();
        for (int[] block : parsePayload(resp))
            blocks.add(readExact(block[0] * block[1]));
        return blocks;
    }

    /** Parse [[name, dtype, [shape...]], ...] into {count, itemsize} pairs
     *  with a tiny scanner (the header grammar is fixed; no JSON dep). */
    private static List<int[]> parsePayload(String resp) {
        List<int[]> out = new ArrayList<>();
        int at = resp.indexOf("\"payload\": [");
        if (at < 0) return out;
        String body = resp.substring(at + 12);
        int pos = 0;
        while ((pos = body.indexOf("[\"", pos)) >= 0) {
            int dtypeStart = body.indexOf("\", \"", pos) + 4;
            int dtypeEnd = body.indexOf("\"", dtypeStart);
            String dtype = body.substring(dtypeStart, dtypeEnd);
            int shapeStart = body.indexOf("[", dtypeEnd);
            int shapeEnd = body.indexOf("]", shapeStart);
            int count = 1;
            String shape = body.substring(shapeStart + 1, shapeEnd).trim();
            if (!shape.isEmpty())
                for (String dim : shape.split(","))
                    count *= Integer.parseInt(dim.trim());
            int itemsize = switch (dtype) {
                case "uint64", "int64", "float64" -> 8;
                case "uint32", "int32", "float32" -> 4;
                case "uint16", "int16" -> 2;
                default -> 1;
            };
            out.add(new int[]{count, itemsize});
            pos = shapeEnd + 1;
        }
        return out;
    }

    void close() throws IOException { chan.close(); }

    // ---- self-test mirroring bindings/c/engine_client.c -------------------

    public static void main(String[] args) throws IOException {
        if (args.length < 1) {
            System.err.println("usage: EngineClient <socket-path>");
            System.exit(2);
        }
        EngineClient cl = new EngineClient(args[0]);

        // levenshtein: 2 queries x 3 candidates, Wagner-Fischer ground truth
        List<ByteBuffer> r = cl.call("levenshtein", "",
                new Tape("queries", new String[]{"kitten", "flaw"}),
                new Tape("candidates", new String[]{"sitting", "lawn", "kitten"}));
        long[] want = {3, 5, 0, 7, 2, 6};
        ByteBuffer dist = r.get(0);
        for (int i = 0; i < 6; i++) {
            long got = dist.getLong(8 * i);
            if (got != want[i]) {
                System.err.printf("FAIL levenshtein[%d] = %d want %d%n",
                        i, got, want[i]);
                System.exit(1);
            }
        }
        System.out.println("levenshtein over the wire: PASS");

        // seeded hash: deterministic across calls, distinct across texts
        Tape texts = new Tape("texts", new String[]{"hello", "world!"});
        ByteBuffer h1 = cl.call("hash", ", \"seed\": 42", texts).get(0);
        ByteBuffer h2 = cl.call("hash", ", \"seed\": 42", texts).get(0);
        if (h1.getLong(0) != h2.getLong(0) || h1.getLong(8) != h2.getLong(8)
                || h1.getLong(0) == h1.getLong(8)) {
            System.err.println("FAIL hash determinism");
            System.exit(1);
        }
        System.out.println("seeded hash over the wire: PASS");

        // fingerprints: identical docs -> identical rows; distinct differ
        String same = "the quick brown fox jumps over the lazy dog again";
        List<ByteBuffer> fp = cl.call("fingerprints", ", \"ndim\": 64",
                new Tape("texts", new String[]{
                        same, "entirely different payload with other shingles",
                        same}));
        ByteBuffer mh = fp.get(0), mc = fp.get(1);
        boolean differs = false;
        for (int d = 0; d < 64; d++) {
            if (mh.getInt(4 * d) != mh.getInt(4 * (128 + d))
                    || mc.getInt(4 * d) != mc.getInt(4 * (128 + d))) {
                System.err.println("FAIL fingerprints identical docs d=" + d);
                System.exit(1);
            }
            if (mh.getInt(4 * d) != mh.getInt(4 * (64 + d))) differs = true;
        }
        if (!differs) {
            System.err.println("FAIL fingerprints: distinct docs collide");
            System.exit(1);
        }
        System.out.println("fingerprints over the wire: PASS");
        cl.close();
    }
}
