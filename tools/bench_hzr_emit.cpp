// Host micro-benchmark: splits the hzr encode cost into histogram /
// tree-build+store / emit on realistic streaming plane bytes
// (/tmp/planes.bin from the streaming bench payload). Single-threaded
// per-byte costs — the streaming stage runs the same code across the
// thread pool, so core-ns/B here maps directly to its wall time.
//   g++ -O3 -march=native -std=c++17 tools/bench_hzr_emit.cpp -o /tmp/bhe
#include "../rspt_tpu/native/rspt_native.cpp"

#include <chrono>
#include <cstdio>
#include <vector>

static double now_s() {
    return std::chrono::duration<double>(
               std::chrono::steady_clock::now().time_since_epoch())
        .count();
}

int main() {
    FILE* f = fopen("/tmp/planes.bin", "rb");
    if (!f) { printf("no /tmp/planes.bin\n"); return 1; }
    fseek(f, 0, SEEK_END);
    size_t n = (size_t)ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> buf(n);
    if (fread(buf.data(), 1, n, f) != n) return 1;
    fclose(f);

    const size_t item = 49152;  // one (frame, plane) = 12ch x 4096 frame
    size_t nitems = n / item;
    std::vector<uint8_t> out(item * 2);
    std::vector<uint32_t> hist(kNumSyms);

    const int reps = 20;
    double t_hist = 0, t_tree = 0, t_full = 0, t_crc = 0;
    size_t total = 0;
    for (int r = 0; r < reps; ++r) {
        for (size_t i = 0; i < nitems; ++i) {
            const uint8_t* p = buf.data() + i * item;
            double t0 = now_s();
            histogram_runs(p, item, hist.data());
            double t1 = now_s();
            // tree build + store only (fresh writer, no emit)
            TreeCtx tree;
            build_tree(hist.data(), tree);
            uint32_t codes[kNumSyms];
            uint8_t code_bits[kNumSyms];
            BitWriter bw(out.data() + kBlockHeaderSize, item);
            store_tree(tree, bw, codes, code_bits);
            double t2 = now_s();
            size_t w = encode_block_hist(p, item, hist.data(), out.data(),
                                         out.size());
            double t3 = now_s();
            uint32_t c = crc32c(out.data() + kBlockHeaderSize,
                                w - kBlockHeaderSize);
            double t4 = now_s();
            t_hist += t1 - t0;
            t_tree += t2 - t1;
            t_full += t3 - t2;
            t_crc += t4 - t3;
            total += w + (c & 1);
        }
    }
    double bytes = (double)n * reps;
    printf("items %zu x %zu B, %d reps (total %.1f MB)  [checksum %zu]\n",
           nitems, item, reps, bytes / 1e6, total);
    printf("hist        %7.3f ms  %5.2f ns/B\n", t_hist * 1e3 / reps,
           t_hist * 1e9 / bytes);
    printf("tree+store  %7.3f ms  %5.2f ns/B\n", t_tree * 1e3 / reps,
           t_tree * 1e9 / bytes);
    printf("full(enc)   %7.3f ms  %5.2f ns/B\n", t_full * 1e3 / reps,
           t_full * 1e9 / bytes);
    printf("emit(=full-tree) %.2f ns/B\n", (t_full - t_tree) * 1e9 / bytes);
    printf("crc32c      %7.3f ms  %5.2f ns/B\n", t_crc * 1e3 / reps,
           t_crc * 1e9 / bytes);
    return 0;
}
