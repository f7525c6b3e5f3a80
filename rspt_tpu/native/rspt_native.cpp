// rspt_native — host-side native runtime for the rspt_tpu framework.
//
// Implements the hot host paths that surround the TPU compute pipeline:
//   * CRC32C (Castagnoli) via slice-by-8
//   * the hzr block entropy codec (RLE + Huffman), byte-identical to the
//     format described in rspt_tpu/formats/hzr_constants.py
//   * serial-order-exact DCT-II / IDCT kernels (the C++ reference
//     accumulates serially in double; summation order changes the
//     truncated int output, so parity requires the same order —
//     see signal_packer_dct.cpp:76-100 in the reference)
//   * int32 wraparound scan kernels (delta/xor/offset) and the
//     interleaved-native <-> channel-major-i32 layout swizzles
//   * FWHT with int32 wraparound butterflies
//
// This is a from-scratch implementation written to the format spec; the
// structure (flat index-based trees, explicit-stack traversal, 64-bit
// bit cache, tokenized two-pass encode) is unlike the reference's
// pointer-based bit-serial code on purpose: it is faster and it mirrors
// the array-parallel TPU formulation.
//
// Build: tools/build_native.py (g++ -O3 -march=native -shared -fPIC)

#include <cstdint>
#include <cstddef>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <condition_variable>
#include <functional>
#include <mutex>
#include <thread>
#include <vector>
#include <atomic>

namespace {

// ---------------------------------------------------------------------------
// Persistent thread pool — std::thread spawn+join per stage measured
// ~0.5 ms/call on the streaming path (4 stages x 4 threads). Workers
// park on a condition variable; the caller participates in every run.
// ---------------------------------------------------------------------------

class ThreadPool {
  public:
    explicit ThreadPool(int nworkers) {
        for (int i = 0; i < nworkers; ++i)
            workers_.emplace_back([this] { loop(); });
    }

    // Execute fn(slot) for slot in [0, m); returns when all done.
    void run(int m, const std::function<void(int)>& fn) {
        if (m <= 1) {
            for (int s = 0; s < m; ++s) fn(s);
            return;
        }
        std::unique_lock<std::mutex> lk(mu_);
        fn_ = &fn;
        total_.store(m, std::memory_order_release);
        done_.store(0, std::memory_order_relaxed);
        // release: publishes fn_/total_/done_ to workers that skip the
        // cv path (late wakers from a previous epoch)
        next_.store(0, std::memory_order_release);
        ++epoch_;
        cv_.notify_all();
        lk.unlock();
        work();  // caller participates
        lk.lock();
        cv_done_.wait(lk, [&] {
            return done_.load(std::memory_order_acquire)
                >= total_.load(std::memory_order_relaxed);
        });
        // close the gate: a late waker from this epoch must never see
        // next_ below a LATER run's total_ (it would claim a slot
        // before that run resets next_). Huge next_ + zero total_
        // makes the work() guard fail for any stale state.
        next_.store(1 << 30, std::memory_order_relaxed);
        total_.store(0, std::memory_order_relaxed);
        fn_ = nullptr;
    }

    static ThreadPool& inst() {
        // leaked on purpose: joining at static destruction deadlocks
        static ThreadPool* p = new ThreadPool(
            (int)std::thread::hardware_concurrency() - 1);
        return *p;
    }

  private:
    void work() {
        int s;
        // total_ is atomic (published with release in run()); fn_ is
        // loaded into a local AFTER the next_ acquire so the pointer
        // read is ordered behind the epoch's publication — no UB race
        while ((s = next_.fetch_add(1, std::memory_order_acquire))
               < total_.load(std::memory_order_acquire)) {
            const std::function<void(int)>* fn = fn_;
            (*fn)(s);
            if (done_.fetch_add(1, std::memory_order_acq_rel) + 1
                >= total_.load(std::memory_order_relaxed)) {
                std::lock_guard<std::mutex> lk(mu_);
                cv_done_.notify_all();
            }
        }
    }

    void loop() {
        uint64_t seen = 0;
        for (;;) {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [&] { return epoch_ != seen; });
            seen = epoch_;
            lk.unlock();
            work();
        }
    }

    std::mutex mu_;
    std::condition_variable cv_, cv_done_;
    std::vector<std::thread> workers_;
    const std::function<void(int)>* fn_ = nullptr;
    std::atomic<int> total_{0};
    uint64_t epoch_ = 0;
    std::atomic<int> next_{0};
    std::atomic<int> done_{0};
};

// Split [0, n) into nt ranges and run them on the pool.
inline void pool_ranges(size_t n, size_t nt,
                        const std::function<void(size_t, size_t)>& fn) {
    if (nt > n) nt = n;
    if (nt <= 1) {
        fn(0, n);
        return;
    }
    std::function<void(int)> slot = [&](int t) {
        fn(n * (size_t)t / nt, n * ((size_t)t + 1) / nt);
    };
    ThreadPool::inst().run((int)nt, slot);
}

// ---------------------------------------------------------------------------
// CRC32C, slice-by-8
// ---------------------------------------------------------------------------

uint32_t g_crc_tab[8][256];

struct CrcInit {
    CrcInit() {
        const uint32_t poly = 0x82F63B78u;
        for (uint32_t i = 0; i < 256; ++i) {
            uint32_t c = i;
            for (int k = 0; k < 8; ++k) c = (c >> 1) ^ ((c & 1) ? poly : 0);
            g_crc_tab[0][i] = c;
        }
        for (int j = 1; j < 8; ++j)
            for (uint32_t i = 0; i < 256; ++i)
                g_crc_tab[j][i] = g_crc_tab[0][g_crc_tab[j - 1][i] & 0xFF] ^
                                  (g_crc_tab[j - 1][i] >> 8);
    }
} g_crc_init;

static uint32_t crc32c_sw(const uint8_t* p, size_t n, uint32_t c) {
    while (n >= 8) {
        uint32_t lo, hi;
        memcpy(&lo, p, 4);
        memcpy(&hi, p + 4, 4);
        lo ^= c;
        c = g_crc_tab[7][lo & 0xFF] ^ g_crc_tab[6][(lo >> 8) & 0xFF] ^
            g_crc_tab[5][(lo >> 16) & 0xFF] ^ g_crc_tab[4][lo >> 24] ^
            g_crc_tab[3][hi & 0xFF] ^ g_crc_tab[2][(hi >> 8) & 0xFF] ^
            g_crc_tab[1][(hi >> 16) & 0xFF] ^ g_crc_tab[0][hi >> 24];
        p += 8;
        n -= 8;
    }
    while (n--) c = g_crc_tab[0][(c ^ *p++) & 0xFF] ^ (c >> 8);
    return c;
}

// Hardware CRC32C with runtime dispatch (the reference runtime-
// dispatches SSE4.2/ARMv8 single-stream loops, hzr_crc32c_sse4.c:30-80;
// here the HW path additionally runs 3 interleaved streams to cover
// the crc32 instruction's 3-cycle latency, recombined with
// precomputed GF(2) shift-by-leg tables).
static const size_t kCrcLeg = 2048;  // bytes per interleaved stream leg

uint32_t g_crc_shift[4][256];  // c -> state after kCrcLeg zero bytes

struct CrcShiftInit {
    CrcShiftInit() {  // runs after g_crc_init (same TU, declared later)
        uint32_t z[32];
        for (int i = 0; i < 32; ++i) {
            uint32_t c = 1u << i;
            for (size_t k = 0; k < kCrcLeg; ++k)
                c = g_crc_tab[0][c & 0xFF] ^ (c >> 8);
            z[i] = c;  // zero-byte evolution is GF(2)-linear in state
        }
        for (int j = 0; j < 4; ++j)
            for (uint32_t b = 0; b < 256; ++b) {
                uint32_t r = 0;
                for (int k = 0; k < 8; ++k)
                    if (b & (1u << k)) r ^= z[8 * j + k];
                g_crc_shift[j][b] = r;
            }
    }
} g_crc_shift_init;

static inline uint32_t crc_shift_leg(uint32_t c) {
    return g_crc_shift[0][c & 0xFF] ^ g_crc_shift[1][(c >> 8) & 0xFF] ^
           g_crc_shift[2][(c >> 16) & 0xFF] ^ g_crc_shift[3][c >> 24];
}

#if defined(__x86_64__) || defined(__i386__)
#include <nmmintrin.h>

__attribute__((target("sse4.2")))
static uint32_t crc32c_hw(const uint8_t* p, size_t n, uint32_t c) {
    while (n >= 3 * kCrcLeg) {
        uint64_t a = c, b = 0, d = 0;
        const uint8_t* p1 = p + kCrcLeg;
        const uint8_t* p2 = p + 2 * kCrcLeg;
        for (size_t i = 0; i < kCrcLeg; i += 8) {
            uint64_t w0, w1, w2;
            memcpy(&w0, p + i, 8);
            memcpy(&w1, p1 + i, 8);
            memcpy(&w2, p2 + i, 8);
            a = _mm_crc32_u64(a, w0);
            b = _mm_crc32_u64(b, w1);
            d = _mm_crc32_u64(d, w2);
        }
        // crc(X||Y) state = shift(state_X) ^ state_Y_from_zero
        c = crc_shift_leg(crc_shift_leg((uint32_t)a) ^ (uint32_t)b) ^
            (uint32_t)d;
        p += 3 * kCrcLeg;
        n -= 3 * kCrcLeg;
    }
    while (n >= 8) {
        uint64_t w;
        memcpy(&w, p, 8);
        c = (uint32_t)_mm_crc32_u64(c, w);
        p += 8;
        n -= 8;
    }
    while (n--) c = _mm_crc32_u8(c, *p++);
    return c;
}

static bool crc_hw_ok() {
    static const bool v = __builtin_cpu_supports("sse4.2");
    return v;
}
#elif defined(__aarch64__)
#include <arm_acle.h>

__attribute__((target("+crc")))
static uint32_t crc32c_hw(const uint8_t* p, size_t n, uint32_t c) {
    while (n >= 3 * kCrcLeg) {
        uint32_t a = c, b = 0, d = 0;
        const uint8_t* p1 = p + kCrcLeg;
        const uint8_t* p2 = p + 2 * kCrcLeg;
        for (size_t i = 0; i < kCrcLeg; i += 8) {
            uint64_t w0, w1, w2;
            memcpy(&w0, p + i, 8);
            memcpy(&w1, p1 + i, 8);
            memcpy(&w2, p2 + i, 8);
            a = __crc32cd(a, w0);
            b = __crc32cd(b, w1);
            d = __crc32cd(d, w2);
        }
        c = crc_shift_leg(crc_shift_leg(a) ^ b) ^ d;
        p += 3 * kCrcLeg;
        n -= 3 * kCrcLeg;
    }
    while (n >= 8) {
        uint64_t w;
        memcpy(&w, p, 8);
        c = __crc32cd(c, w);
        p += 8;
        n -= 8;
    }
    while (n--) c = __crc32cb(c, *p++);
    return c;
}

static bool crc_hw_ok() {
#if defined(__ARM_FEATURE_CRC32)
    return true;
#else
    return (getauxval(AT_HWCAP) & HWCAP_CRC32) != 0;
#endif
}
#else
static uint32_t crc32c_hw(const uint8_t* p, size_t n, uint32_t c) {
    return crc32c_sw(p, n, c);
}
static bool crc_hw_ok() { return false; }
#endif

uint32_t crc32c(const uint8_t* p, size_t n) {
    uint32_t c = ~0u;
    c = crc_hw_ok() ? crc32c_hw(p, n, c) : crc32c_sw(p, n, c);
    return ~c;
}

// ---------------------------------------------------------------------------
// hzr format constants (see rspt_tpu/formats/hzr_constants.py)
// ---------------------------------------------------------------------------

constexpr size_t kHeaderSize = 4;
constexpr size_t kBlockHeaderSize = 7;
constexpr size_t kMaxBlockSize = 65536;
constexpr int kModeCopy = 0;
constexpr int kModeHuffRle = 1;
constexpr int kModeFill = 2;
constexpr int kNumSyms = 261;
constexpr int kMaxNodes = kNumSyms * 2 - 1;  // 521
constexpr int kSymBits = 9;
constexpr uint32_t kMaxZeroRun = 16662;

// RLE classification: run length -> (symbol, extra value, extra bits)
inline void classify_run(uint32_t len, uint16_t& sym, uint16_t& extra,
                         uint8_t& ebits) {
    if (len == 1)       { sym = 0;   extra = 0;          ebits = 0; }
    else if (len == 2)  { sym = 256; extra = 0;          ebits = 0; }
    else if (len <= 6)  { sym = 257; extra = len - 3;    ebits = 2; }
    else if (len <= 22) { sym = 258; extra = len - 7;    ebits = 4; }
    else if (len <= 278){ sym = 259; extra = len - 23;   ebits = 8; }
    else                { sym = 260; extra = len - 279;  ebits = 14; }
}

// ---------------------------------------------------------------------------
// LSB-first bit writer with 64-bit cache
// ---------------------------------------------------------------------------

struct BitWriter {
    uint8_t* base;
    uint8_t* p;
    uint8_t* end;
    uint64_t cache = 0;
    int nbits = 0;
    bool failed = false;

    BitWriter(uint8_t* buf, size_t cap) : base(buf), p(buf), end(buf + cap) {}

    inline void put(uint32_t value, int bits) {  // bits <= 32, high bits of value zero
        cache |= (uint64_t)value << nbits;
        nbits += bits;
        while (nbits >= 8) {
            if (p >= end) { failed = true; nbits = 0; return; }
            *p++ = (uint8_t)cache;
            cache >>= 8;
            nbits -= 8;
        }
    }
    inline void put64(uint64_t value, int bits) {  // bits <= 56
        cache |= value << nbits;
        nbits += bits;
        if (nbits >= 8) {
            int nb = nbits >> 3;
            if (p + 8 <= end) {  // bulk spill: one unaligned store
                memcpy(p, &cache, 8);
                p += nb;
                cache >>= nb * 8;
                nbits &= 7;
            } else {
                while (nbits >= 8) {
                    if (p >= end) { failed = true; nbits = 0; return; }
                    *p++ = (uint8_t)cache;
                    cache >>= 8;
                    nbits -= 8;
                }
            }
        }
    }
    inline void flush_partial() {
        if (nbits > 0) {
            if (p >= end) { failed = true; return; }
            *p++ = (uint8_t)(cache & (0xFF >> (8 - nbits)));
            cache = 0;
            nbits = 0;
        }
    }
    size_t bytes_written() const { return (size_t)(p - base); }
    size_t bit_count() const { return 8 * (size_t)(p - base) + nbits; }
};

// LSB-first bit reader
struct BitReader {
    const uint8_t* p;
    const uint8_t* end;
    uint64_t cache = 0;
    int nbits = 0;
    bool failed = false;

    BitReader(const uint8_t* buf, size_t n) : p(buf), end(buf + n) {}

    inline void fill() {
        while (nbits <= 56 && p < end) {
            cache |= (uint64_t)(*p++) << nbits;
            nbits += 8;
        }
    }
    inline uint32_t get(int bits) {
        if (nbits < bits) {
            fill();
            if (nbits < bits) { failed = true; return 0; }
        }
        uint32_t v = (uint32_t)(cache & ((bits == 32) ? 0xFFFFFFFFu
                                                      : ((1u << bits) - 1)));
        cache >>= bits;
        nbits -= bits;
        return v;
    }
    inline int get1() {
        if (nbits < 1) {
            fill();
            if (nbits < 1) { failed = true; return 0; }
        }
        int v = (int)(cache & 1);
        cache >>= 1;
        nbits -= 1;
        return v;
    }
    // Bytes consumed, rounding the current partial byte up.
    size_t consumed(const uint8_t* start) const {
        return (size_t)(p - start) - (size_t)(nbits >> 3);
    }
};

// ---------------------------------------------------------------------------
// Tokenizer + histogram (single fused pass)
// ---------------------------------------------------------------------------

// Length of the zero run at in[k] (capped, never crossing the block
// edge), with 8-byte word skipping for long runs.
static inline size_t zero_run_len(const uint8_t* in, size_t n, size_t k) {
    size_t lim = n - k;
    if (lim > kMaxZeroRun) lim = kMaxZeroRun;
    size_t z = 1;
    while (z + 8 <= lim) {
        uint64_t w;
        memcpy(&w, in + k + z, 8);
        if (w != 0) {
#if defined(__GNUC__)
            z += (size_t)(__builtin_ctzll(w) >> 3);
#else
            while (z < lim && in[k + z] == 0) ++z;
#endif
            return z;
        }
        z += 8;
    }
    while (z < lim && in[k + z] == 0) ++z;
    return z;
}

// Histogram pass without materializing tokens (4-way split literal
// counters dodge store-forward stalls on repeated bytes).
static void histogram_runs(const uint8_t* in, size_t n, uint32_t* hist) {
    uint32_t h[4][256];
    memset(h, 0, sizeof(h));
    memset(hist, 0, kNumSyms * sizeof(uint32_t));
    size_t k = 0;
    while (k < n) {
        // literal stretch: unrolled 4-way until a zero shows up
        while (k + 4 <= n) {
            uint8_t b0 = in[k], b1 = in[k + 1], b2 = in[k + 2],
                    b3 = in[k + 3];
            if (!(b0 && b1 && b2 && b3)) break;
            h[0][b0]++;
            h[1][b1]++;
            h[2][b2]++;
            h[3][b3]++;
            k += 4;
        }
        if (k >= n) break;
        uint8_t b = in[k];
        if (b != 0) {
            h[0][b]++;
            ++k;
            continue;
        }
        size_t z = zero_run_len(in, n, k);
        uint16_t sym, extra;
        uint8_t ebits;
        classify_run((uint32_t)z, sym, extra, ebits);
        hist[sym]++;
        k += z;
    }
    for (int s = 1; s < 256; ++s)
        hist[s] += h[0][s] + h[1][s] + h[2][s] + h[3][s];
}

inline uint8_t extra_bits_of(uint16_t sym) {
    switch (sym) {
        case 257: return 2;
        case 258: return 4;
        case 259: return 8;
        case 260: return 14;
        default: return 0;
    }
}

// ---------------------------------------------------------------------------
// Huffman tree, replicating the reference's greedy build + tie-breaking
// (hzr_encode.c:222-283): scan nodes[0..next) each round, `<=` means the
// latest minimal node wins; internal nodes append after leaves.
//
// The scan's selection is equivalent to popping the two minima of the
// strict total order (count asc, node index DESC): the `<=` replacement
// makes the LAST minimal index win for n1, and the same tie rule holds
// for n2 (invariant count[n1] <= count[n2] after every step). A binary
// min-heap keyed on (count << 16) | (0xFFFF - index) therefore
// reproduces the reference's merge sequence bit-exactly in O(n log n)
// instead of the O(n^2) rescan — the rescan cost ~1.2 ns per input
// byte on 48-64 KiB blocks, half the whole encode stage.
// ---------------------------------------------------------------------------

struct TreeCtx {
    int16_t sym[kMaxNodes];     // >=0 leaf symbol, -1 branch
    int16_t child_a[kMaxNodes];
    int16_t child_b[kMaxNodes];
    uint32_t count[kMaxNodes];
    int next = 0;
    int root = -1;
    bool single = false;
};

void build_tree(const uint32_t* hist, TreeCtx& t) {
    t.next = 0;
    for (int s = 0; s < kNumSyms; ++s) {
        if (hist[s] > 0) {
            t.sym[t.next] = (int16_t)s;
            t.count[t.next] = hist[s];
            t.child_a[t.next] = t.child_b[t.next] = -1;
            ++t.next;
        }
    }
    int num_symbols = t.next;
    t.root = -1;
    t.single = false;
    if (num_symbols == 0) return;
    if (num_symbols == 1) {
        t.root = 0;
        t.single = true;
        return;
    }
    // min-heap over (count << 16) | (0xFFFF - index); counts are block
    // token totals (<= 64Ki) so they fit 17 bits and never collide with
    // the index field after summing (<= 2^17 << 16 < 2^64).
    uint64_t heap[kMaxNodes];
    int hn = 0;
    auto hpush = [&](uint64_t key) {
        int i = hn++;
        heap[i] = key;
        while (i > 0) {
            int p = (i - 1) >> 1;
            if (heap[p] <= heap[i]) break;
            std::swap(heap[p], heap[i]);
            i = p;
        }
    };
    auto hpop = [&]() -> uint64_t {
        uint64_t top = heap[0];
        heap[0] = heap[--hn];
        int i = 0;
        for (;;) {
            int l = 2 * i + 1, r2 = l + 1, m = i;
            if (l < hn && heap[l] < heap[m]) m = l;
            if (r2 < hn && heap[r2] < heap[m]) m = r2;
            if (m == i) break;
            std::swap(heap[i], heap[m]);
            i = m;
        }
        return top;
    };
    for (int k = 0; k < num_symbols; ++k)
        hpush(((uint64_t)t.count[k] << 16) | (uint64_t)(0xFFFF - k));
    while (hn > 1) {
        uint64_t k1 = hpop(), k2 = hpop();
        int n1 = 0xFFFF - (int)(k1 & 0xFFFF);
        int n2 = 0xFFFF - (int)(k2 & 0xFFFF);
        int r = t.next++;
        t.sym[r] = -1;
        t.child_a[r] = (int16_t)n1;
        t.child_b[r] = (int16_t)n2;
        t.count[r] = t.count[n1] + t.count[n2];
        t.count[n1] = 0;
        t.count[n2] = 0;
        t.root = r;
        hpush(((uint64_t)t.count[r] << 16) | (uint64_t)(0xFFFF - r));
    }
}

// Preorder serialization: leaf = 1 + 9-bit symbol; branch = 0 then A (code
// unchanged) and B (bit `bits` set). Explicit stack; pushing B before A
// reproduces the recursive A-then-B order (hzr_encode.c:177-219).
void store_tree(const TreeCtx& t, BitWriter& bw, uint32_t* codes,
                uint8_t* code_bits) {
    struct Item { int16_t node; uint32_t code; uint8_t bits; };
    Item stack[kMaxNodes + 1];
    int sp = 0;
    stack[sp++] = {(int16_t)t.root, 0u, (uint8_t)(t.single ? 1 : 0)};
    while (sp > 0) {
        Item it = stack[--sp];
        if (t.sym[it.node] >= 0) {
            bw.put(1, 1);
            bw.put((uint32_t)t.sym[it.node], kSymBits);
            codes[t.sym[it.node]] = it.code;
            code_bits[t.sym[it.node]] = it.bits;
            if (bw.failed) return;
            continue;
        }
        bw.put(0, 1);
        if (bw.failed) return;
        stack[sp++] = {t.child_b[it.node],
                       it.code | (1u << it.bits), (uint8_t)(it.bits + 1)};
        stack[sp++] = {t.child_a[it.node], it.code, (uint8_t)(it.bits + 1)};
    }
}

// true if all tokens are in one code class; zeros (sym 0 / RLE) are one
// class (hzr_encode.c:285-305)
bool only_single_code(const uint32_t* hist) {
    int has_zeros = (hist[0] > 0) ? 1 : 0;
    for (int s = 256; s < kNumSyms; ++s)
        if (hist[s] > 0) { has_zeros = 1; break; }
    int nonzero = 0;
    for (int s = 1; s < 256; ++s)
        if (hist[s] > 0 && ++nonzero + has_zeros > 1) return false;
    return (nonzero + has_zeros) == 1;
}

// ---------------------------------------------------------------------------
// Block encode
// ---------------------------------------------------------------------------

inline void write_block_header(uint8_t* hdr, uint16_t size_minus_1,
                               uint32_t crc, uint8_t mode) {
    hdr[0] = (uint8_t)size_minus_1;
    hdr[1] = (uint8_t)(size_minus_1 >> 8);
    memcpy(hdr + 2, &crc, 4);
    hdr[6] = mode;
}

// Returns encoded size incl. header, or 0 on buffer overflow.
// Two passes over the raw bytes (histogram, then re-derive runs and
// emit directly) — no materialized token array: the 4 B/token
// write+read traffic was the encoder's hottest memory stream.
// encode_block with a caller-supplied histogram (the streaming path
// folds the histogram into its preprocess pass — same run semantics,
// one fewer scan over the plane bytes).
size_t encode_block_hist(const uint8_t* in, size_t in_size,
                         const uint32_t* hist, uint8_t* out, size_t cap) {
    if (only_single_code(hist)) {  // FILL
        if (cap < kBlockHeaderSize + 1) return 0;
        write_block_header(out, 0, crc32c(in, 1), kModeFill);
        out[kBlockHeaderSize] = in[0];
        return kBlockHeaderSize + 1;
    }

    // The payload region is limited to in_size bytes (copy fallback
    // beyond that), also bounded by the caller's remaining capacity.
    size_t payload_cap = in_size;
    if (cap < kBlockHeaderSize) return 0;
    if (cap - kBlockHeaderSize < payload_cap) payload_cap = cap - kBlockHeaderSize;

    TreeCtx tree;
    build_tree(hist, tree);
    uint32_t codes[kNumSyms];
    uint8_t code_bits[kNumSyms];
    BitWriter bw(out + kBlockHeaderSize, payload_cap);
    store_tree(tree, bw, codes, code_bits);

    if (!bw.failed) {
        size_t k = 0;
        while (k < in_size && !bw.failed) {
            // quad/paired-literal fast path: adjacent codes merged into
            // one put64 (identical bit layout — fields are LSB-first
            // adjacent). Max Huffman depth at <=64Ki counts is ~23
            // bits; four typical-depth codes fit put64's 56-bit budget,
            // a pair always does. (An 8-wide variant measured SLOWER on
            // the zero-dense plane bytes — the probe fails too often.)
            while (k + 4 <= in_size) {
                uint8_t b0 = in[k], b1 = in[k + 1], b2 = in[k + 2],
                        b3 = in[k + 3];
                if (!(b0 && b1 && b2 && b3)) break;
                int n01 = code_bits[b0] + code_bits[b1];
                int n23 = code_bits[b2] + code_bits[b3];
                uint64_t v01 = (uint64_t)codes[b0] |
                               ((uint64_t)codes[b1] << code_bits[b0]);
                uint64_t v23 = (uint64_t)codes[b2] |
                               ((uint64_t)codes[b3] << code_bits[b2]);
                if (n01 + n23 <= 56) {
                    bw.put64(v01 | (v23 << n01), n01 + n23);
                } else {
                    bw.put64(v01, n01);
                    bw.put64(v23, n23);
                }
                if (bw.failed) break;
                k += 4;
            }
            while (k + 2 <= in_size && !bw.failed) {
                uint8_t b0 = in[k], b1 = in[k + 1];
                if (!(b0 && b1)) break;
                bw.put64((uint64_t)codes[b0] |
                             ((uint64_t)codes[b1] << code_bits[b0]),
                         code_bits[b0] + code_bits[b1]);
                k += 2;
            }
            if (k >= in_size || bw.failed) break;
            uint8_t b = in[k];
            if (b != 0) {
                bw.put64(codes[b], code_bits[b]);
                ++k;
                continue;
            }
            size_t z = zero_run_len(in, in_size, k);
            uint16_t sym, extra;
            uint8_t ebits;
            classify_run((uint32_t)z, sym, extra, ebits);
            bw.put64((uint64_t)codes[sym] |
                         ((uint64_t)extra << code_bits[sym]),
                     code_bits[sym] + ebits);
            k += z;
        }
    }
    if (!bw.failed) bw.flush_partial();

    size_t payload = bw.bytes_written();
    if (bw.failed || payload >= kMaxBlockSize) {  // COPY fallback
        if (cap < kBlockHeaderSize + in_size) return 0;
        write_block_header(out, (uint16_t)(in_size - 1), crc32c(in, in_size),
                           kModeCopy);
        memcpy(out + kBlockHeaderSize, in, in_size);
        return kBlockHeaderSize + in_size;
    }
    write_block_header(out, (uint16_t)(payload - 1),
                       crc32c(out + kBlockHeaderSize, payload), kModeHuffRle);
    return kBlockHeaderSize + payload;
}

size_t encode_block(const uint8_t* in, size_t in_size, uint8_t* out,
                    size_t cap) {
    uint32_t hist[kNumSyms];
    histogram_runs(in, in_size, hist);
    return encode_block_hist(in, in_size, hist, out, cap);
}

// ---------------------------------------------------------------------------
// Block decode
// ---------------------------------------------------------------------------

constexpr int kLutBits = 13;
constexpr int kLutSize = 1 << kLutBits;

struct DecTree {
    int16_t child_a[kMaxNodes];
    int16_t child_b[kMaxNodes];
    int16_t sym[kMaxNodes];
    int count = 0;
    // kLutBits-wide peek LUT: node >= 0 means continue walking from
    // node; else terminal with symbol/consumed-bits.
    int16_t lut_node[kLutSize];
    uint16_t lut_sym[kLutSize];
    uint8_t lut_bits[kLutSize];
};

// Iterative preorder tree recovery mirroring RecoverTree
// (hzr_decode.c:263-333) including the node-count limit.
int recover_tree(BitReader& br, DecTree& t) {
    struct Item { int16_t parent; uint32_t code; uint8_t bits; bool is_b; };
    Item stack[kMaxNodes + 1];
    int sp = 0;
    t.count = 0;
    // seed: the root
    stack[sp++] = {-1, 0u, 0, false};
    int root = -1;
    while (sp > 0) {
        Item it = stack[--sp];
        int idx = t.count++;
        if (t.count >= kMaxNodes) return -1;
        if (it.parent >= 0) {
            if (it.is_b) t.child_b[it.parent] = (int16_t)idx;
            else t.child_a[it.parent] = (int16_t)idx;
        } else {
            root = idx;
        }
        t.sym[idx] = -1;
        t.child_a[idx] = t.child_b[idx] = -1;
        int is_leaf = br.get1();
        if (br.failed) return -1;
        if (is_leaf) {
            int sym = (int)br.get(kSymBits);
            if (br.failed) return -1;
            t.sym[idx] = (int16_t)sym;
            if (it.bits <= kLutBits) {
                uint32_t dups = (uint32_t)kLutSize >> it.bits;
                uint8_t b = it.bits > 1 ? it.bits : 1;  // single-symbol case
                for (uint32_t i = 0; i < dups; ++i) {
                    uint32_t slot = (i << it.bits) | it.code;
                    t.lut_node[slot] = -1;
                    t.lut_sym[slot] = (uint16_t)sym;
                    t.lut_bits[slot] = b;
                }
            }
            continue;
        }
        if (it.bits == kLutBits) {
            t.lut_node[it.code] = (int16_t)idx;
            t.lut_sym[it.code] = 0;
            t.lut_bits[it.code] = kLutBits;
        }
        // push B then A so A is processed first (preorder)
        stack[sp++] = {(int16_t)idx, it.code | (1u << it.bits),
                       (uint8_t)(it.bits + 1), true};
        stack[sp++] = {(int16_t)idx, it.code, (uint8_t)(it.bits + 1), false};
    }
    return root;
}

// Decode one block's payload into out[0..out_size). Returns 0 on success.
int decode_block_payload(const uint8_t* payload, size_t payload_len,
                         uint8_t* out, size_t out_size) {
    BitReader br(payload, payload_len);
    DecTree tree;
    int root = recover_tree(br, tree);
    if (root < 0) return 1;
    bool single = tree.sym[root] >= 0;

    uint8_t* op = out;
    uint8_t* oend = out + out_size;
    while (op < oend) {
        int sym;
        if (single) {
            br.get1();
            if (br.failed) return 1;
            sym = tree.sym[root];
        } else {
            // branchless 8-byte refill while far from the input end
            if (br.nbits < 56 && br.p + 8 <= br.end) {
                uint64_t w;
                memcpy(&w, br.p, 8);
                br.cache |= w << br.nbits;
                br.p += (63 - br.nbits) >> 3;
                br.nbits |= 56;
            } else {
                br.fill();
            }
            if (br.nbits >= kLutBits) {
                uint32_t peek = (uint32_t)(br.cache & (kLutSize - 1));
                int16_t node = tree.lut_node[peek];
                uint8_t bits = tree.lut_bits[peek];
                br.cache >>= bits;
                br.nbits -= bits;
                if (node < 0) {
                    sym = tree.lut_sym[peek];
                } else {
                    while (tree.sym[node] < 0) {
                        int b = br.get1();
                        if (br.failed) return 1;
                        node = b ? tree.child_b[node] : tree.child_a[node];
                    }
                    sym = tree.sym[node];
                }
            } else {
                // tail: plain tree walk
                int16_t node = (int16_t)root;
                while (tree.sym[node] < 0) {
                    int b = br.get1();
                    if (br.failed) return 1;
                    node = b ? tree.child_b[node] : tree.child_a[node];
                }
                sym = tree.sym[node];
            }
        }
        if (sym <= 255) {
            *op++ = (uint8_t)sym;
        } else {
            size_t zeros;
            switch (sym) {
                case 256: zeros = 2; break;
                case 257: zeros = (size_t)br.get(2) + 3; break;
                case 258: zeros = (size_t)br.get(4) + 7; break;
                case 259: zeros = (size_t)br.get(8) + 23; break;
                case 260: zeros = (size_t)br.get(14) + 279; break;
                default: return 1;
            }
            if (br.failed || op + zeros > oend) return 1;
            memset(op, 0, zeros);
            op += zeros;
        }
    }
    return 0;
}

}  // namespace

// ===========================================================================
// C API
// ===========================================================================

extern "C" {

uint32_t rn_crc32c(const uint8_t* data, size_t n) { return crc32c(data, n); }

size_t rn_hzr_max_size(size_t n) {
    if (n == 0) return kHeaderSize;
    size_t blocks = (n + kMaxBlockSize - 1) / kMaxBlockSize;
    return kHeaderSize + blocks * kBlockHeaderSize + n;
}

int rn_hzr_encode(const uint8_t* in, size_t in_size, uint8_t* out,
                  size_t cap, size_t* out_len) {
    if (cap < kHeaderSize) return 1;
    uint32_t sz = (uint32_t)in_size;
    memcpy(out, &sz, 4);
    size_t pos = kHeaderSize;
    for (size_t start = 0; start < in_size; start += kMaxBlockSize) {
        size_t bs = in_size - start;
        if (bs > kMaxBlockSize) bs = kMaxBlockSize;
        size_t e = encode_block(in + start, bs, out + pos, cap - pos);
        if (e == 0) return 1;
        pos += e;
    }
    *out_len = pos;
    return 0;
}

int rn_hzr_decode(const uint8_t* in, size_t in_size, uint8_t* out,
                  size_t out_cap, size_t* consumed) {
    if (in_size < kHeaderSize) return 1;
    uint32_t total;
    memcpy(&total, in, 4);
    if (out_cap < total) return 1;
    size_t pos = kHeaderSize;
    size_t done = 0;
    while (done < total) {
        size_t bs = total - done;
        if (bs > kMaxBlockSize) bs = kMaxBlockSize;
        if (pos + kBlockHeaderSize > in_size) return 1;
        uint16_t esz_m1;
        memcpy(&esz_m1, in + pos, 2);
        size_t esz = (size_t)esz_m1 + 1;
        uint8_t mode = in[pos + 6];
        pos += kBlockHeaderSize;
        if (mode == kModeCopy) {
            if (esz != bs || pos + bs > in_size) return 1;
            memcpy(out + done, in + pos, bs);
            pos += bs;
        } else if (mode == kModeFill) {
            if (pos + 1 > in_size) return 1;
            memset(out + done, in[pos], bs);
            pos += 1;
        } else if (mode == kModeHuffRle) {
            if (pos + esz > in_size) return 1;
            if (decode_block_payload(in + pos, esz, out + done, bs)) return 1;
            pos += esz;
        } else {
            return 1;
        }
        done += bs;
    }
    if (consumed) *consumed = pos;
    return 0;
}

int rn_hzr_verify(const uint8_t* in, size_t in_size, size_t* decoded_size) {
    if (in_size < kHeaderSize) return 1;
    uint32_t total;
    memcpy(&total, in, 4);
    *decoded_size = total;
    size_t pos = kHeaderSize;
    size_t done = 0;
    while (done < total) {
        size_t bs = total - done;
        if (bs > kMaxBlockSize) bs = kMaxBlockSize;
        if (pos + kBlockHeaderSize > in_size) return 1;
        uint16_t esz_m1;
        memcpy(&esz_m1, in + pos, 2);
        size_t esz = (size_t)esz_m1 + 1;
        uint32_t want;
        memcpy(&want, in + pos + 2, 4);
        uint8_t mode = in[pos + 6];
        if (mode > kModeFill) return 1;
        pos += kBlockHeaderSize;
        size_t adv = (mode == kModeFill) ? 1 : esz;
        if (pos + adv > in_size) return 1;
        if (crc32c(in + pos, mode == kModeFill ? 1 : esz) != want) return 1;
        pos += adv;
        done += bs;
    }
    return 0;
}

// 16-bit-peek decode LUTs in rspt_tpu/hzr/jax_decoder.py build_lut
// format, recovered straight from a HUFF block payload: l1 (65536) i32
// leaf -> sym | bits<<16, deep (>16-bit prefix) -> slot | 1<<30;
// l2 (l2_cap, 256) i32 slot rows -> sym | total_bits<<16. Returns the
// number of deep slots used (>= 0) or -1 on parse error / l2_cap /
// >24-bit code. *dbits_out = tree-description bit length (the body's
// start offset, hzr_decode.c:263-333 consumption).
static int declut16_one(const uint8_t* payload, size_t plen, int32_t* l1,
                        int32_t* l2, int l2_cap, int32_t* dbits_out) {
    BitReader br(payload, plen);
    DecTree t;
    int root = recover_tree(br, t);
    if (root < 0) return -1;
    *dbits_out = (int32_t)(8 * (size_t)(br.p - payload) - (size_t)br.nbits);
    struct It { int16_t node; uint32_t code; uint16_t bits; };
    It stack[kMaxNodes + 1];
    int sp = 0;
    int n_deep = 0;
    stack[sp++] = {(int16_t)root, 0u, 0};
    while (sp > 0) {
        It it = stack[--sp];
        if (t.sym[it.node] >= 0) {
            int b = it.bits > 0 ? it.bits : 1;  // degenerate single leaf
            uint32_t step = 1u << it.bits;
            int32_t v = (int32_t)t.sym[it.node] | (b << 16);
            for (uint32_t c = it.code; c < 65536u; c += step) l1[c] = v;
            continue;
        }
        if (it.bits == 16) {
            if (n_deep >= l2_cap) return -1;
            int32_t* row = l2 + (size_t)n_deep * 256;
            l1[it.code] = n_deep | (1 << 30);
            ++n_deep;
            It st2[kMaxNodes + 1];
            int sp2 = 0;
            st2[sp2++] = {it.node, 0u, 0};
            while (sp2 > 0) {
                It i2 = st2[--sp2];
                if (t.sym[i2.node] >= 0) {
                    uint32_t step2 = 1u << i2.bits;
                    int32_t v2 = (int32_t)t.sym[i2.node] |
                                 ((16 + (int)i2.bits) << 16);
                    for (uint32_t c = i2.code; c < 256u; c += step2)
                        row[c] = v2;
                    continue;
                }
                if (i2.bits >= 8) return -1;  // > 24-bit code
                st2[sp2++] = {t.child_b[i2.node],
                              i2.code | (1u << i2.bits),
                              (uint16_t)(i2.bits + 1)};
                st2[sp2++] = {t.child_a[i2.node], i2.code,
                              (uint16_t)(i2.bits + 1)};
            }
            continue;
        }
        stack[sp++] = {t.child_b[it.node], it.code | (1u << it.bits),
                       (uint16_t)(it.bits + 1)};
        stack[sp++] = {t.child_a[it.node], it.code,
                       (uint16_t)(it.bits + 1)};
    }
    return n_deep;
}

// Nibble-format decode LUTs (hzr/pallas_decoder.build_lut_nib): 8-bit
// root l1 (256 i32): leaf -> sym | bits<<16 (bits<=8; degenerate
// single leaf consumes 1); deep -> (1<<30) | slot. Level-k slot = 16
// i32: leaf -> sym | (8+4k+b)<<16; internal at the nibble boundary ->
// (1<<30) | next-level slot. Returns 0, or -1 on parse error /
// >24-bit code / slot-cap overflow (the caller routes such blocks to
// the host decoder — consistent with the cost heuristic, which
// rejects them anyway at any sane chunk cap).
static int declutnib_one(const uint8_t* payload, size_t plen,
                         int32_t* l1, int32_t* lvls, int32_t* nslots,
                         int cap_slots, int32_t* dbits_out) {
    BitReader br(payload, plen);
    DecTree t;
    int root = recover_tree(br, t);
    if (root < 0) return -1;
    *dbits_out =
        (int32_t)(8 * (size_t)(br.p - payload) - (size_t)br.nbits);
    for (int k = 0; k < 4; ++k) nslots[k] = 0;
    std::function<int(int16_t, int)> walk_nib = [&](int16_t node,
                                                    int lvl) -> int {
        if (lvl >= 4) return -1;
        if (nslots[lvl] >= cap_slots) return -1;
        int sid = nslots[lvl]++;
        int32_t* arr = lvls + ((size_t)lvl * cap_slots + sid) * 16;
        std::function<bool(int16_t, uint32_t, int)> w =
            [&](int16_t nd, uint32_t c, int b) -> bool {
            if (t.sym[nd] >= 0) {
                uint32_t step = 1u << b;
                int32_t v = (int32_t)t.sym[nd]
                            | ((8 + 4 * lvl + b) << 16);
                for (uint32_t i = c; i < 16u; i += step) arr[i] = v;
                return true;
            }
            if (b == 4) {
                int s2 = walk_nib(nd, lvl + 1);
                if (s2 < 0) return false;
                arr[c] = (int32_t)((1u << 30) | (uint32_t)s2);
                return true;
            }
            return w(t.child_a[nd], c, b + 1) &&
                   w(t.child_b[nd], c | (1u << b), b + 1);
        };
        return w(node, 0, 0) ? sid : -1;
    };
    std::function<bool(int16_t, uint32_t, int)> walk =
        [&](int16_t nd, uint32_t code, int bits) -> bool {
        if (t.sym[nd] >= 0) {
            int b = bits > 0 ? bits : 1;
            uint32_t step = 1u << bits;
            int32_t v = (int32_t)t.sym[nd] | (b << 16);
            for (uint32_t c = code; c < 256u; c += step) l1[c] = v;
            return true;
        }
        if (bits == 8) {
            int sid = walk_nib(nd, 0);
            if (sid < 0) return false;
            l1[code] = (int32_t)((1u << 30) | (uint32_t)sid);
            return true;
        }
        return walk(t.child_a[nd], code, bits + 1) &&
               walk(t.child_b[nd], code | (1u << bits), bits + 1);
    };
    return walk((int16_t)root, 0, 0) ? 0 : -1;
}

extern "C" int rn_declutnib_batch(const uint8_t* buf, const int64_t* offs,
                                  const int64_t* lens, int nb,
                                  int32_t* l1s, int32_t* lvls,
                                  int32_t* nslots, int32_t* dbits,
                                  int32_t* ok, int cap_slots,
                                  int nthreads) {
    if (nthreads <= 0) nthreads = (int)std::thread::hardware_concurrency();
    std::atomic<int> next(0);
    auto work = [&](size_t, size_t) {
        int i;
        while ((i = next.fetch_add(1)) < nb) {
            ok[i] = declutnib_one(
                buf + offs[i], (size_t)lens[i], l1s + (size_t)i * 256,
                lvls + (size_t)i * 4 * (size_t)cap_slots * 16,
                nslots + (size_t)i * 4, cap_slots, dbits + i);
        }
    };
    pool_ranges((size_t)(nthreads < nb ? nthreads : nb),
                (size_t)(nthreads < nb ? nthreads : nb),
                [&](size_t a, size_t b2) { work(a, b2); });
    return 0;
}

// Batch declut16 over nb payload spans of one buffer, threaded.
// l1s: nb*65536 i32 (caller-zeroed not required; fully overwritten
// per leaf coverage... zero first anyway for safety on parse error),
// l2s: nb*l2_cap*256 i32 (zero-initialized by caller), n_deep/dbits:
// nb i32 outs. Returns 0, or 1 if any block failed (n_deep[i] = -1).
int rn_declut16_batch(const uint8_t* buf, const int64_t* offs,
                      const int64_t* lens, int nb, int32_t* l1s,
                      int32_t* l2s, int l2_cap, int32_t* n_deep,
                      int32_t* dbits, int nthreads) {
    if (nthreads <= 0) nthreads = (int)std::thread::hardware_concurrency();
    std::atomic<int> next(0);
    std::atomic<int> bad(0);
    auto work = [&](size_t, size_t) {
        int i;
        while ((i = next.fetch_add(1)) < nb) {
            n_deep[i] = declut16_one(
                buf + offs[i], (size_t)lens[i], l1s + (size_t)i * 65536,
                l2s + (size_t)i * l2_cap * 256, l2_cap, dbits + i);
            if (n_deep[i] < 0) bad.store(1);
        }
    };
    pool_ranges((size_t)(nthreads < nb ? nthreads : nb),
                (size_t)(nthreads < nb ? nthreads : nb),
                [&](size_t a, size_t b2) { work(a, b2); });
    return bad.load();
}

// --- scans (int32 wraparound; reference: utils.cpp:193-236) ---------------

void rn_delta_encode(int32_t* a, size_t n) {
    int32_t last = 0;
    for (size_t i = 0; i < n; ++i) {
        int32_t cur = a[i];
        a[i] = (int32_t)((uint32_t)cur - (uint32_t)last);
        last = cur;
    }
}

void rn_delta_decode(int32_t* a, size_t n, int32_t min_val) {
    uint32_t last = 0;
    for (size_t i = 0; i < n; ++i) {
        last = last + (uint32_t)a[i] + (uint32_t)min_val;
        a[i] = (int32_t)last;
    }
}

void rn_offset32(int32_t* a, size_t n, int32_t v) {
    for (size_t i = 0; i < n; ++i) a[i] = (int32_t)((uint32_t)a[i] + (uint32_t)v);
}

void rn_xor_encode(int32_t* a, size_t n) {
    int32_t last = 0;
    for (size_t i = 0; i < n; ++i) {
        int32_t d = last ^ a[i];
        last = a[i];
        a[i] = d;
    }
}

void rn_xor_decode(int32_t* a, size_t n) {
    for (size_t i = 1; i < n; ++i) a[i] = a[i - 1] ^ a[i];
}

// --- layout swizzles (reference: utils.cpp:51-191) -------------------------

void rn_native_to_i32(int32_t* dst, const uint8_t* native, size_t nr_samples,
                      size_t ch, size_t bps, int reverse) {
    for (size_t s = 0; s < nr_samples; ++s) {
        for (size_t c = 0; c < ch; ++c) {
            const uint8_t* p = native + (s * ch + c) * bps;
            uint32_t v = 0;
            if (reverse)
                for (size_t k = 0; k < bps; ++k)
                    v |= (uint32_t)p[k] << (8 * (bps - 1 - k));
            else
                for (size_t k = 0; k < bps; ++k) v |= (uint32_t)p[k] << (8 * k);
            int sh = 32 - 8 * (int)bps;
            dst[c * nr_samples + s] = (int32_t)(v << sh) >> sh;
        }
    }
}

void rn_i32_to_native(uint8_t* native, const int32_t* src, size_t nr_samples,
                      size_t ch, size_t bps, int reverse) {
    for (size_t s = 0; s < nr_samples; ++s) {
        for (size_t c = 0; c < ch; ++c) {
            uint32_t v = (uint32_t)src[c * nr_samples + s];
            uint8_t* p = native + (s * ch + c) * bps;
            if (reverse)
                for (size_t k = 0; k < bps; ++k)
                    p[k] = (uint8_t)(v >> (8 * (bps - 1 - k)));
            else
                for (size_t k = 0; k < bps; ++k) p[k] = (uint8_t)(v >> (8 * k));
        }
    }
}

// --- byte planes ------------------------------------------------------------

void rn_plane_split(const int32_t* flat, size_t n, int planes, uint8_t* out) {
    for (int k = 0; k < planes; ++k) {
        uint8_t* o = out + (size_t)k * n;
        for (size_t i = 0; i < n; ++i) o[i] = (uint8_t)((uint32_t)flat[i] >> (8 * k));
    }
}

void rn_plane_merge(const uint8_t* planes, size_t n, int p, int32_t* out) {
    for (size_t i = 0; i < n; ++i) {
        uint32_t v = 0;
        for (int k = 0; k < p; ++k)
            v |= (uint32_t)planes[(size_t)k * n + i] << (8 * k);
        if (p < 4) {
            int sh = 32 - 8 * p;
            out[i] = ((int32_t)(v << sh)) >> sh;
        } else {
            out[i] = (int32_t)v;
        }
    }
}

// --- transforms -------------------------------------------------------------

// Serial-order-exact DCT-II with folded quantization
// (reference: signal_packer_dct.cpp:76-87). C usual arithmetic
// conversions make `src[x] * COSINES[x][i]` a FLOAT product (int
// promotes to float); only the accumulator is double — replicated here
// exactly, including the truncating double->int conversion.
void rn_dct_forward(const int32_t* src, int32_t* dst, const float* cosines,
                    const float* cs, int n, double quality) {
    double ratio1 = __builtin_sqrt(2.0 / n);
    for (int i = 0; i < n; ++i) {
        double sum = 0;
        for (int x = 0; x < n; ++x) {
            float p = (float)src[x] * cosines[(size_t)x * n + i];
            sum += (double)p;
        }
        sum *= cs[i] * ratio1 / quality;
        dst[i] = (int32_t)sum;
    }
}

// IDCT (signal_packer_dct.cpp:89-100). `Cs[x] * dct[x] * COSINES[i][x]`
// evaluates left-to-right entirely in float before the double accumulate.
void rn_dct_inverse(const int32_t* dct, int32_t* out, const float* cosines,
                    const float* cs, int n, double quality) {
    double ratio1 = __builtin_sqrt(2.0 / n);
    for (int i = 0; i < n; ++i) {
        double sum = 0;
        for (int x = 0; x < n; ++x) {
            float p = cs[x] * (float)dct[x];
            p = p * cosines[(size_t)i * n + x];
            sum += (double)p;
        }
        sum *= ratio1 * quality;
        out[i] = (int32_t)sum;
    }
}

// Blocked + multithreaded DCT, bit-exact with the serial kernels above.
// The per-output accumulation (signal_packer_dct.cpp:76-87) is a serial
// f64 sum over x — but outputs i and channels are mutually independent,
// so tiling over i (contiguous table rows, SIMD across the tile) and
// threading over (channel, i-tile) tasks preserves every rounding step.
// Forward reads cosines[x*n+i] (row-contiguous in i); inverse takes the
// TRANSPOSED table so its access is also row-contiguous.

static const int kDctTile = 16;

static void dct_fwd_tile(const int32_t* src, int32_t* dst,
                         const float* cosines, const float* cs, int n,
                         double quality, double ratio1, int i0, int i1) {
    double acc[kDctTile];
    for (int t = 0; t < i1 - i0; ++t) acc[t] = 0;
    for (int x = 0; x < n; ++x) {
        float s = (float)src[x];
        const float* row = cosines + (size_t)x * n + i0;
        for (int t = 0; t < i1 - i0; ++t)
            acc[t] += (double)(s * row[t]);
    }
    for (int t = 0; t < i1 - i0; ++t) {
        double sum = acc[t];
        sum *= cs[i0 + t] * ratio1 / quality;
        dst[i0 + t] = (int32_t)sum;
    }
}

static void dct_inv_tile(const float* q, int32_t* out,
                         const float* cosines_t, int n, double quality,
                         double ratio1, int i0, int i1) {
    double acc[kDctTile];
    for (int t = 0; t < i1 - i0; ++t) acc[t] = 0;
    for (int x = 0; x < n; ++x) {
        float s = q[x];
        const float* row = cosines_t + (size_t)x * n + i0;
        for (int t = 0; t < i1 - i0; ++t)
            acc[t] += (double)(s * row[t]);
    }
    for (int t = 0; t < i1 - i0; ++t) {
        double sum = acc[t];
        sum *= ratio1 * quality;
        out[i0 + t] = (int32_t)sum;
    }
}

// ch channels, channel-major src/dst (ch*n each). Threads over
// (channel, tile) so 12 channels x 256 tiles feed every core.
void rn_dct_forward_mt(const int32_t* src, int32_t* dst,
                       const float* cosines, const float* cs, int ch, int n,
                       double quality, int nthreads) {
    double ratio1 = __builtin_sqrt(2.0 / n);
    int tiles = (n + kDctTile - 1) / kDctTile;
    (void)nthreads;  // pool size is fixed; parameter kept for API symmetry
    std::function<void(int)> task = [&](int slot) {
        int c = slot / tiles, ti = slot % tiles;
        int i0 = ti * kDctTile, i1 = i0 + kDctTile;
        if (i1 > n) i1 = n;
        dct_fwd_tile(src + (size_t)c * n, dst + (size_t)c * n, cosines, cs,
                     n, quality, ratio1, i0, i1);
    };
    ThreadPool::inst().run(ch * tiles, task);
}

// cosines_t = transpose of the forward table (values bit-identical;
// layout flipped so the tile loop reads contiguous rows).
void rn_dct_inverse_mt(const int32_t* dct, int32_t* out,
                       const float* cosines_t, const float* cs, int ch,
                       int n, double quality, int nthreads) {
    double ratio1 = __builtin_sqrt(2.0 / n);
    int tiles = (n + kDctTile - 1) / kDctTile;
    (void)nthreads;
    // q[x] = Cs[x] * (float)dct[x] — the float prefactor the serial
    // kernel computes per term (signal_packer_dct.cpp:95), hoisted per
    // channel. Same float rounding: one float multiply.
    std::vector<float> q((size_t)ch * n);
    std::function<void(int)> prep = [&](int c) {
        const int32_t* d = dct + (size_t)c * n;
        float* qq = q.data() + (size_t)c * n;
        for (int x = 0; x < n; ++x) qq[x] = cs[x] * (float)d[x];
    };
    ThreadPool::inst().run(ch, prep);
    std::function<void(int)> task = [&](int slot) {
        int c = slot / tiles, ti = slot % tiles;
        int i0 = ti * kDctTile, i1 = i0 + kDctTile;
        if (i1 > n) i1 = n;
        dct_inv_tile(q.data() + (size_t)c * n, out + (size_t)c * n,
                     cosines_t, n, quality, ratio1, i0, i1);
    };
    ThreadPool::inst().run(ch * tiles, task);
}

// FWHT, int32 wraparound butterflies (reference: lib_fwht/fwht.c:4-28).
void rn_fwht(const int32_t* src, int32_t* dst, int n) {
    std::vector<int32_t> buf(n);
    const int32_t* a = src;
    int32_t* b = dst;
    int32_t* other = buf.data();
    for (int i = n >> 1; i > 0; i >>= 1) {
        for (int base = 0; base < n; base += 2 * i) {
            for (int j = 0; j < i; ++j) {
                uint32_t u = (uint32_t)a[base + j];
                uint32_t v = (uint32_t)a[base + i + j];
                b[base + j] = (int32_t)(u + v);
                b[base + i + j] = (int32_t)(u - v);
            }
        }
        if (a == src) { a = b; b = other; }
        else { int32_t* t = (int32_t*)a; a = b; b = t; }
    }
    if (a != dst) memcpy(dst, a, sizeof(int32_t) * n);
}

void rn_fwht_normalize(int32_t* a, int n, double ratio) {
    double d = n / ratio;
    for (int i = 0; i < n; ++i) a[i] = (int32_t)(a[i] / d);
}

void rn_fwht_normalize2(int32_t* a, int n, double ratio) {
    for (int i = 0; i < n; ++i) a[i] = (int32_t)(a[i] / ratio);
}

// --- multi-threaded helpers -------------------------------------------------

// Encode P independent byte planes concurrently; each output chunk is
// [u32 len][hzr stream] at out + k*stride. Returns 0 on success.
int rn_encode_planes_mt(const uint8_t* planes, size_t plane_len, int nplanes,
                        uint8_t* out, size_t stride, size_t* lens,
                        int nthreads) {
    if (nthreads <= 0) nthreads = (int)std::thread::hardware_concurrency();
    std::vector<int> rcs(nplanes, 0);
    auto work = [&](int k) {
        size_t olen = 0;
        rcs[k] = rn_hzr_encode(planes + (size_t)k * plane_len, plane_len,
                               out + (size_t)k * stride + 4, stride - 4, &olen);
        uint32_t l32 = (uint32_t)olen;
        memcpy(out + (size_t)k * stride, &l32, 4);
        lens[k] = olen;
    };
    if (nthreads <= 1 || nplanes <= 1) {
        for (int k = 0; k < nplanes; ++k) work(k);
    } else {
        std::vector<std::thread> ts;
        for (int k = 0; k < nplanes; ++k) ts.emplace_back(work, k);
        for (auto& t : ts) t.join();
    }
    for (int k = 0; k < nplanes; ++k)
        if (rcs[k]) return 1;
    return 0;
}

// Block-parallel hzr encode across ALL planes: every 64 KiB block of
// every plane is an independent work item (hzr_encode.c:528-539);
// encode into per-block scratch, then concatenate per plane with the
// 4-byte master headers and u32 chunk-length prefixes. Balances small
// thread pools much better than plane-level threading when plane costs
// differ (plane 0 is often COPY-incompressible, plane 2 mostly FILL).
int rn_encode_planes_blocks_mt(const uint8_t* planes, size_t plane_len,
                               int nplanes, uint8_t* out, size_t stride,
                               size_t* lens, int nthreads) {
    if (nthreads <= 0) nthreads = (int)std::thread::hardware_concurrency();
    size_t nb_per = (plane_len + kMaxBlockSize - 1) / kMaxBlockSize;
    if (nb_per == 0) nb_per = 1;
    int nb = (int)(nb_per * nplanes);
    // worst-case per block: header + block + a little
    size_t bcap = kMaxBlockSize + kBlockHeaderSize + 16;
    std::vector<uint8_t> scratch((size_t)nb * bcap);
    std::vector<size_t> blens(nb, 0);
    std::vector<int> rcs(nb, 0);
    std::atomic<int> next(0);
    // dynamic work stealing: block costs vary wildly (COPY vs Huffman)
    auto work = [&]() {
        int i;
        while ((i = next.fetch_add(1)) < nb) {
            int plane = i / (int)nb_per;
            size_t off = (size_t)(i % nb_per) * kMaxBlockSize;
            size_t blen = plane_len - off < kMaxBlockSize
                          ? plane_len - off : kMaxBlockSize;
            if (plane_len == 0) blen = 0;
            if (blen == 0) continue;
            size_t r = encode_block(planes + (size_t)plane * plane_len + off,
                                    blen, scratch.data() + (size_t)i * bcap,
                                    bcap);
            if (!r) rcs[i] = 1;
            blens[i] = r;
        }
    };
    if (nthreads <= 1 || nb <= 1) {
        work();
    } else {
        int nt = nthreads < nb ? nthreads : nb;
        std::vector<std::thread> ts;
        for (int t = 0; t < nt; ++t) ts.emplace_back(work);
        for (auto& t : ts) t.join();
    }
    for (int i = 0; i < nb; ++i)
        if (rcs[i]) return 1;
    // assemble per plane: [u32 chunk_len][u32 decoded_size][blocks...]
    for (int p = 0; p < nplanes; ++p) {
        uint8_t* dst = out + (size_t)p * stride;
        size_t pos = 4 + kHeaderSize;  // chunk len + hzr master header
        for (size_t b = 0; b < nb_per; ++b) {
            size_t i = (size_t)p * nb_per + b;
            if (pos + blens[i] > stride) return 1;
            memcpy(dst + pos, scratch.data() + i * bcap, blens[i]);
            pos += blens[i];
        }
        uint32_t total = (uint32_t)plane_len;
        memcpy(dst + 4, &total, 4);
        uint32_t clen = (uint32_t)(pos - 4);
        memcpy(dst, &clen, 4);
        lens[p] = pos - 4;
    }
    return 0;
}

// Block-parallel hzr decode: hop the 7-byte headers to find each
// 64 KiB block's offset (cheap, serial), then decode all blocks
// concurrently — the block independence the format guarantees
// (hzr_encode.c:528-539 re-derives the tree per block).
int rn_hzr_decode_blocks_mt(const uint8_t* in, size_t in_len, uint8_t* out,
                            size_t out_cap, int nthreads) {
    if (in_len < kHeaderSize) return 1;
    uint32_t total;
    memcpy(&total, in, 4);
    if (total > out_cap) return 1;
    if (nthreads <= 0) nthreads = (int)std::thread::hardware_concurrency();
    // header hop
    std::vector<size_t> in_off, out_off, blens;
    size_t pos = kHeaderSize, left = total, opos = 0;
    while (left > 0) {
        size_t blen = left < kMaxBlockSize ? left : kMaxBlockSize;
        if (pos + kBlockHeaderSize > in_len) return 1;
        uint16_t sz;
        memcpy(&sz, in + pos, 2);
        uint8_t mode = in[pos + 6];
        in_off.push_back(pos);
        out_off.push_back(opos);
        blens.push_back(blen);
        size_t payload = (mode == kModeFill) ? 1 : (size_t)sz + 1;
        pos += kBlockHeaderSize + payload;
        opos += blen;
        left -= blen;
    }
    int nb = (int)in_off.size();
    std::vector<int> rcs(nb, 0);
    std::atomic<int> next(0);
    auto work = [&]() {
        int i;
        while ((i = next.fetch_add(1)) < nb) {
            size_t p = in_off[i];
            uint16_t sz;
            memcpy(&sz, in + p, 2);
            uint8_t mode = in[p + 6];
            const uint8_t* payload = in + p + kBlockHeaderSize;
            uint8_t* dst = out + out_off[i];
            size_t blen = blens[i];
            if (mode == kModeCopy) {
                if ((size_t)sz + 1 != blen) { rcs[i] = 1; continue; }
                memcpy(dst, payload, blen);
            } else if (mode == kModeFill) {
                memset(dst, payload[0], blen);
            } else if (mode == kModeHuffRle) {
                if (decode_block_payload(payload, (size_t)sz + 1, dst, blen))
                    rcs[i] = 1;
            } else rcs[i] = 1;
        }
    };
    if (nthreads <= 1 || nb <= 1) {
        work();
    } else {
        int nt = nthreads < nb ? nthreads : nb;
        std::vector<std::thread> ts;
        for (int t = 0; t < nt; ++t) ts.emplace_back(work);
        for (auto& t : ts) t.join();
    }
    for (int i = 0; i < nb; ++i)
        if (rcs[i]) return 1;
    return 0;
}

// Fused multithreaded xdelta encode preprocess: interleaved native
// bytes -> byte planes of xor(offset(delta)) in ONE pass. The encode
// direction is local (delta/xor only look back ≤2 samples, and the
// *input* is fully available), so it parallelizes perfectly — unlike
// the decode direction, which is a true prefix scan.
// Also returns fit=0 if any value needs more than nr_planes bytes
// (the verify-and-grow test) — computed in the same pass.
//   native: interleaved [s0c0][s0c1]... little-endian bps-byte samples
//   planes: (nr_planes, ch*n) output, plane-major
int rn_xdelta_preprocess_mt(const uint8_t* native_b, size_t nr_samples,
                            size_t nr_channels, size_t bps, int nr_planes,
                            uint8_t* planes, int nthreads) {
    if (nthreads <= 0) nthreads = (int)std::thread::hardware_concurrency();
    const size_t N = nr_samples * nr_channels;   // flat length
    const int sh_fit = 32 - 8 * nr_planes;
    std::atomic<int> fit(1);

    auto load = [&](size_t flat_idx) -> int32_t {
        // flat index is channel-major: ch = flat/n, s = flat%n
        size_t c = flat_idx / nr_samples;
        size_t s = flat_idx % nr_samples;
        const uint8_t* p = native_b + (s * nr_channels + c) * bps;
        uint32_t v = 0;
        for (size_t k = 0; k < bps; ++k) v |= (uint32_t)p[k] << (8 * k);
        int shift = (int)(32 - 8 * bps);
        return (int32_t)(v << shift) >> shift;
    };

    auto work = [&](size_t lo, size_t hi) {
        int local_fit = 1;
        // carry the previous two samples; all arithmetic unsigned
        // (int32 wraparound without signed-overflow UB)
        uint32_t vm1 = lo >= 1 ? (uint32_t)load(lo - 1) : 0;
        uint32_t vm2 = lo >= 2 ? (uint32_t)load(lo - 2) : 0;
        for (size_t i = lo; i < hi; ++i) {
            uint32_t v = (uint32_t)load(i);
            uint32_t d = v - vm1 - 128u;
            uint32_t dm1 = i >= 1 ? vm1 - vm2 - 128u : 0u;
            int32_t x = (int32_t)(d ^ dm1);
            if (nr_planes < 4 &&
                ((int32_t)((uint32_t)x << sh_fit) >> sh_fit) != x)
                local_fit = 0;
            uint32_t ux = (uint32_t)x;
            for (int k = 0; k < nr_planes; ++k)
                planes[(size_t)k * N + i] = (uint8_t)(ux >> (8 * k));
            vm2 = vm1;
            vm1 = v;
        }
        if (!local_fit) fit.store(0);
    };
    if (nthreads <= 1) {
        work(0, N);
    } else {
        std::vector<std::thread> ts;
        for (int t = 0; t < nthreads; ++t)
            ts.emplace_back(work, N * t / nthreads, N * (t + 1) / nthreads);
        for (auto& t : ts) t.join();
    }
    return fit.load();
}

// Fused multithreaded xdelta decode postprocess: byte planes ->
// interleaved native bytes. The decode direction is a double prefix
// (prefix-xor then prefix-sum), parallelized with the classic
// chunk-local scan + carry combine:
//   pass A: per-chunk xor totals of the merged values
//   (serial, tiny)  exclusive xor carries per chunk
//   pass B: per-chunk d[i] = (carry ^ local-prefix-xor) + 128 into a
//           temp, plus per-chunk sums
//   (serial, tiny)  exclusive sum carries
//   pass C: v[i] = sum-carry + local prefix sum, written straight to
//           the interleaved native layout
int rn_xdelta_postprocess_mt(const uint8_t* planes, size_t nr_samples,
                             size_t nr_channels, size_t bps, int nr_planes,
                             uint8_t* native_out, int32_t* tmp,
                             int nthreads) {
    if (nthreads <= 0) nthreads = (int)std::thread::hardware_concurrency();
    const size_t N = nr_samples * nr_channels;
    int nt = nthreads < 1 ? 1 : nthreads;
    if ((size_t)nt > N) nt = (int)(N ? N : 1);
    std::vector<size_t> lo(nt), hi(nt);
    for (int t = 0; t < nt; ++t) { lo[t] = N * t / nt; hi[t] = N * (t + 1) / nt; }
    const int shm = 32 - 8 * nr_planes;

    auto merge_at = [&](size_t i) -> uint32_t {
        uint32_t v = 0;
        for (int k = 0; k < nr_planes; ++k)
            v |= (uint32_t)planes[(size_t)k * N + i] << (8 * k);
        if (nr_planes < 4)
            v = (uint32_t)((int32_t)(v << shm) >> shm);
        return v;
    };

    // pass A: xor totals
    std::vector<uint32_t> xtot(nt, 0);
    {
        std::vector<std::thread> ts;
        for (int t = 0; t < nt; ++t)
            ts.emplace_back([&, t] {
                uint32_t x = 0;
                for (size_t i = lo[t]; i < hi[t]; ++i) x ^= merge_at(i);
                xtot[t] = x;
            });
        for (auto& th : ts) th.join();
    }
    std::vector<uint32_t> xcarry(nt, 0);
    for (int t = 1; t < nt; ++t) xcarry[t] = xcarry[t - 1] ^ xtot[t - 1];

    // pass B: d values + sum totals
    std::vector<uint32_t> stot(nt, 0);
    {
        std::vector<std::thread> ts;
        for (int t = 0; t < nt; ++t)
            ts.emplace_back([&, t] {
                uint32_t lx = 0, s = 0;
                for (size_t i = lo[t]; i < hi[t]; ++i) {
                    lx ^= merge_at(i);
                    uint32_t d = (xcarry[t] ^ lx) + 128u;
                    tmp[i] = (int32_t)d;
                    s += d;
                }
                stot[t] = s;
            });
        for (auto& th : ts) th.join();
    }
    std::vector<uint32_t> scarry(nt, 0);
    for (int t = 1; t < nt; ++t) scarry[t] = scarry[t - 1] + stot[t - 1];

    // pass C: prefix sums -> interleaved native bytes
    {
        std::vector<std::thread> ts;
        for (int t = 0; t < nt; ++t)
            ts.emplace_back([&, t] {
                uint32_t v = scarry[t];
                for (size_t i = lo[t]; i < hi[t]; ++i) {
                    v += (uint32_t)tmp[i];
                    size_t c = i / nr_samples;
                    size_t sidx = i % nr_samples;
                    uint8_t* p = native_out + (sidx * nr_channels + c) * bps;
                    for (size_t k = 0; k < bps; ++k)
                        p[k] = (uint8_t)(v >> (8 * k));
                }
            });
        for (auto& th : ts) th.join();
    }
    return 0;
}

// 1 if every value sign-extends from nr_planes bytes (the xdelta
// verify-and-grow test, without materializing planes+merge)
int rn_planes_fit(const int32_t* a, size_t n, int nr_planes) {
    if (nr_planes >= 4) return 1;
    int sh = 32 - 8 * nr_planes;
    for (size_t i = 0; i < n; ++i) {
        int32_t v = a[i];
        if (((int32_t)((uint32_t)v << sh) >> sh) != v) return 0;
    }
    return 1;
}

// All planes × all blocks in one thread pool (used by the TPU packers'
// decompress: nplanes chunks each [u32 len][hzr stream]).
int rn_decode_planes_blocks_mt(const uint8_t* in, size_t in_len, int nplanes,
                               size_t plane_len, uint8_t* planes,
                               size_t* consumed, int nthreads) {
    if (nthreads <= 0) nthreads = (int)std::thread::hardware_concurrency();
    size_t pos = 0;
    std::vector<int> rcs(nplanes, 0);
    std::vector<std::thread> ts;
    for (int k = 0; k < nplanes; ++k) {
        if (pos + 4 > in_len) return 1;
        uint32_t l32;
        memcpy(&l32, in + pos, 4);
        pos += 4;
        if (pos + l32 > in_len) return 1;
        const uint8_t* s = in + pos;
        uint8_t* d = planes + (size_t)k * plane_len;
        int per = nthreads / nplanes > 0 ? nthreads / nplanes : 1;
        ts.emplace_back([s, l32, d, plane_len, per, &rcs, k] {
            rcs[k] = rn_hzr_decode_blocks_mt(s, l32, d, plane_len, per);
        });
        pos += l32;
    }
    for (auto& t : ts) t.join();
    *consumed = pos;
    for (int k = 0; k < nplanes; ++k)
        if (rcs[k]) return 1;
    return 0;
}

int rn_decode_planes_mt(const uint8_t* in, size_t in_len, int nplanes,
                        size_t plane_len, uint8_t* planes, size_t* consumed,
                        int nthreads) {
    // Parse chunk offsets serially (they're length-prefixed), decode
    // concurrently.
    std::vector<const uint8_t*> starts(nplanes);
    std::vector<size_t> lens(nplanes);
    size_t pos = 0;
    for (int k = 0; k < nplanes; ++k) {
        if (pos + 4 > in_len) return 1;
        uint32_t l32;
        memcpy(&l32, in + pos, 4);
        pos += 4;
        if (pos + l32 > in_len) return 1;
        starts[k] = in + pos;
        lens[k] = l32;
        pos += l32;
    }
    *consumed = pos;
    std::vector<int> rcs(nplanes, 0);
    auto work = [&](int k) {
        rcs[k] = rn_hzr_decode(starts[k], lens[k],
                               planes + (size_t)k * plane_len, plane_len,
                               nullptr);
    };
    if (nthreads == 1 || nplanes <= 1) {
        for (int k = 0; k < nplanes; ++k) work(k);
    } else {
        std::vector<std::thread> ts;
        for (int k = 0; k < nplanes; ++k) ts.emplace_back(work, k);
        for (auto& t : ts) t.join();
    }
    for (int k = 0; k < nplanes; ++k)
        if (rcs[k]) return 1;
    return 0;
}

// Batched Huffman table build for the JAX two-pass encoder
// (rspt_tpu/hzr/jax_coder.py): per block, build the reference-exact
// greedy tree (hzr_encode.c:222-283) from a 261-bin histogram and emit
// the code LUT + host-packed preorder tree description.
//   hists:      (nb, 261) u32
//   codes:      (nb, 261) u32 out
//   cbits:      (nb, 261) i32 out
//   desc_bytes: (nb, desc_stride) u8 out (zero-padded)
//   desc_bits:  (nb,) i32 out — description length in bits
//   is_fill:    (nb,) u8 out — 1 when the block is single-code FILL
int rn_build_tables(const uint32_t* hists, int nb,
                    uint32_t* codes, int32_t* cbits,
                    uint8_t* desc_bytes, size_t desc_stride,
                    int32_t* desc_bits, uint8_t* is_fill, int nthreads) {
    if (nthreads <= 0) nthreads = (int)std::thread::hardware_concurrency();
    std::vector<int> rcs(nb, 0);
    auto work = [&](int lo, int hi) {
        for (int i = lo; i < hi; ++i) {
            const uint32_t* hist = hists + (size_t)i * kNumSyms;
            uint32_t* cod = codes + (size_t)i * kNumSyms;
            int32_t* cbt = cbits + (size_t)i * kNumSyms;
            uint8_t* db = desc_bytes + (size_t)i * desc_stride;
            memset(cod, 0, kNumSyms * sizeof(uint32_t));
            memset(cbt, 0, kNumSyms * sizeof(int32_t));
            memset(db, 0, desc_stride);
            desc_bits[i] = 0;
            if (only_single_code(hist)) { is_fill[i] = 1; continue; }
            is_fill[i] = 0;
            TreeCtx tree;
            build_tree(hist, tree);
            if (tree.root < 0) { is_fill[i] = 1; continue; }
            uint32_t c32[kNumSyms];
            uint8_t cb8[kNumSyms];
            memset(c32, 0, sizeof(c32));
            memset(cb8, 0, sizeof(cb8));
            BitWriter bw(db, desc_stride);
            store_tree(tree, bw, c32, cb8);
            if (bw.failed) { rcs[i] = 1; continue; }
            int nbits_partial = (int)(bw.bit_count());
            bw.flush_partial();
            desc_bits[i] = nbits_partial;
            for (int s = 0; s < kNumSyms; ++s) {
                cod[s] = c32[s];
                cbt[s] = cb8[s];
            }
        }
    };
    if (nthreads <= 1 || nb <= 1) {
        work(0, nb);
    } else {
        int nt = nthreads < nb ? nthreads : nb;
        std::vector<std::thread> ts;
        for (int t = 0; t < nt; ++t)
            ts.emplace_back(work, nb * t / nt, nb * (t + 1) / nt);
        for (auto& t : ts) t.join();
    }
    for (int i = 0; i < nb; ++i)
        if (rcs[i]) return 1;
    return 0;
}

// Fixed-order unrolled IIR bodies: state lives in registers instead of
// being shifted through memory every sample (the generic loop measured
// ~10x slower). Operation ORDER is identical to the generic loop for
// both accumulation modes, so outputs are bit-identical.
#define RN_IIR_UNROLL(P)                                                  \
static void iir_arr_##P(const double* x, size_t n, const double* nc,      \
                        const double* dc, double* xz, double* yz,         \
                        int opt, double* y) {                             \
    double xs[P], ys[P];                                                  \
    for (int i = 0; i < P; ++i) { xs[i] = xz[i]; ys[i] = yz[i]; }         \
    if (opt) {                                                            \
        for (size_t t = 0; t < n; ++t) {                                  \
            for (int i = P - 1; i > 0; --i) {                             \
                xs[i] = xs[i - 1];                                        \
                ys[i] = ys[i - 1];                                        \
            }                                                             \
            xs[0] = x[t];                                                 \
            double acc = dc[0] * xs[0];                                   \
            for (int i = 1; i < P; ++i) acc = acc + dc[i] * xs[i];        \
            for (int i = 1; i < P; ++i) acc = acc - nc[i] * ys[i];        \
            ys[0] = acc;                                                  \
            y[t] = acc;                                                   \
        }                                                                 \
    } else {                                                              \
        for (size_t t = 0; t < n; ++t) {                                  \
            for (int i = P - 1; i > 0; --i) {                             \
                xs[i] = xs[i - 1];                                        \
                ys[i] = ys[i - 1];                                        \
            }                                                             \
            xs[0] = x[t];                                                 \
            double acc = dc[0] * xs[0];                                   \
            for (int i = 1; i < P; ++i) {                                 \
                acc += dc[i] * xs[i];                                     \
                acc -= nc[i] * ys[i];                                     \
            }                                                             \
            ys[0] = acc;                                                  \
            y[t] = acc;                                                   \
        }                                                                 \
    }                                                                     \
    for (int i = 0; i < P; ++i) { xz[i] = xs[i]; yz[i] = ys[i]; }         \
}

RN_IIR_UNROLL(2)
RN_IIR_UNROLL(3)
RN_IIR_UNROLL(4)
RN_IIR_UNROLL(5)

// Serial IIR array filter with the reference's exact accumulation
// orders (iir_filter.cpp:64-107). State rings xz/yz length p
// (index 0 = current slot), updated in place.
void rn_iir_filter_array(const double* x, size_t n, const double* nc,
                         const double* dc, int p, double* xz, double* yz,
                         int opt, double* y) {
    switch (p) {
        case 2: iir_arr_2(x, n, nc, dc, xz, yz, opt, y); return;
        case 3: iir_arr_3(x, n, nc, dc, xz, yz, opt, y); return;
        case 4: iir_arr_4(x, n, nc, dc, xz, yz, opt, y); return;
        case 5: iir_arr_5(x, n, nc, dc, xz, yz, opt, y); return;
        default: break;
    }
    for (size_t t = 0; t < n; ++t) {
        for (int i = p - 1; i > 0; --i) {
            xz[i] = xz[i - 1];
            yz[i] = yz[i - 1];
        }
        xz[0] = x[t];
        double acc;
        if (opt) {
            acc = dc[0] * xz[0];
            for (int i = 1; i < p; ++i) acc = acc + dc[i] * xz[i];
            for (int i = 1; i < p; ++i) acc = acc - nc[i] * yz[i];
        } else {
            acc = dc[0] * xz[0];
            for (int i = 1; i < p; ++i) {
                acc += dc[i] * xz[i];
                acc -= nc[i] * yz[i];
            }
        }
        yz[0] = acc;
        y[t] = acc;
    }
}

// 4-way channel-interleaved IIR: four independent serial recurrences
// advance through one loop with private register state each — their
// FP dependency chains interleave in the pipeline, so one core runs
// ~4 channels at the latency cost of one (the per-sample accumulation
// chain of a single channel is FP-latency-bound at ~9 serial adds).
// Per-channel operation order is IDENTICAL to iir_arr_P → bit-exact.
#define RN_IIR_UNROLL4(P)                                                 \
static void iir_arr4_##P(const double* const* xs4, size_t n,              \
                         const double* nc, const double* dc,              \
                         double* const* xz4, double* const* yz4,          \
                         int opt, double* const* ys4) {                   \
    double xs[4][P], ys[4][P];                                            \
    for (int c = 0; c < 4; ++c)                                           \
        for (int i = 0; i < P; ++i) {                                     \
            xs[c][i] = xz4[c][i];                                         \
            ys[c][i] = yz4[c][i];                                         \
        }                                                                 \
    if (opt) {                                                            \
        for (size_t t = 0; t < n; ++t) {                                  \
            double acc[4];                                                \
            for (int c = 0; c < 4; ++c) {                                 \
                for (int i = P - 1; i > 0; --i) {                         \
                    xs[c][i] = xs[c][i - 1];                              \
                    ys[c][i] = ys[c][i - 1];                              \
                }                                                         \
                xs[c][0] = xs4[c][t];                                     \
                acc[c] = dc[0] * xs[c][0];                                \
            }                                                             \
            for (int i = 1; i < P; ++i)                                   \
                for (int c = 0; c < 4; ++c)                               \
                    acc[c] = acc[c] + dc[i] * xs[c][i];                   \
            for (int i = 1; i < P; ++i)                                   \
                for (int c = 0; c < 4; ++c)                               \
                    acc[c] = acc[c] - nc[i] * ys[c][i];                   \
            for (int c = 0; c < 4; ++c) {                                 \
                ys[c][0] = acc[c];                                        \
                ys4[c][t] = acc[c];                                       \
            }                                                             \
        }                                                                 \
    } else {                                                              \
        for (size_t t = 0; t < n; ++t) {                                  \
            double acc[4];                                                \
            for (int c = 0; c < 4; ++c) {                                 \
                for (int i = P - 1; i > 0; --i) {                         \
                    xs[c][i] = xs[c][i - 1];                              \
                    ys[c][i] = ys[c][i - 1];                              \
                }                                                         \
                xs[c][0] = xs4[c][t];                                     \
                acc[c] = dc[0] * xs[c][0];                                \
            }                                                             \
            for (int i = 1; i < P; ++i)                                   \
                for (int c = 0; c < 4; ++c) {                             \
                    acc[c] += dc[i] * xs[c][i];                           \
                    acc[c] -= nc[i] * ys[c][i];                           \
                }                                                         \
            for (int c = 0; c < 4; ++c) {                                 \
                ys[c][0] = acc[c];                                        \
                ys4[c][t] = acc[c];                                       \
            }                                                             \
        }                                                                 \
    }                                                                     \
    for (int c = 0; c < 4; ++c)                                           \
        for (int i = 0; i < P; ++i) {                                     \
            xz4[c][i] = xs[c][i];                                         \
            yz4[c][i] = ys[c][i];                                         \
        }                                                                 \
}

RN_IIR_UNROLL4(2)
RN_IIR_UNROLL4(3)
RN_IIR_UNROLL4(4)
RN_IIR_UNROLL4(5)

// Same 4-way interleaved kernel reading STRIDED int32 samples (the
// bps==4 interleaved source) with in-register (double) conversion —
// no materialized double span, no separate convert stage. The
// conversion int32 -> double is exact, so outputs are bit-identical
// to converting first.
#define RN_IIR_UNROLL4S(P)                                                \
static void iir_arr4s_##P(const int32_t* const* xs4, size_t stride,       \
                          size_t n, const double* nc, const double* dc,   \
                          double* const* xz4, double* const* yz4,         \
                          int opt, double* const* ys4) {                  \
    double xs[4][P], ys[4][P];                                            \
    for (int c = 0; c < 4; ++c)                                           \
        for (int i = 0; i < P; ++i) {                                     \
            xs[c][i] = xz4[c][i];                                         \
            ys[c][i] = yz4[c][i];                                         \
        }                                                                 \
    if (opt) {                                                            \
        for (size_t t = 0; t < n; ++t) {                                  \
            double acc[4];                                                \
            for (int c = 0; c < 4; ++c) {                                 \
                for (int i = P - 1; i > 0; --i) {                         \
                    xs[c][i] = xs[c][i - 1];                              \
                    ys[c][i] = ys[c][i - 1];                              \
                }                                                         \
                xs[c][0] = (double)xs4[c][t * stride];                    \
                acc[c] = dc[0] * xs[c][0];                                \
            }                                                             \
            for (int i = 1; i < P; ++i)                                   \
                for (int c = 0; c < 4; ++c)                               \
                    acc[c] = acc[c] + dc[i] * xs[c][i];                   \
            for (int i = 1; i < P; ++i)                                   \
                for (int c = 0; c < 4; ++c)                               \
                    acc[c] = acc[c] - nc[i] * ys[c][i];                   \
            for (int c = 0; c < 4; ++c) {                                 \
                ys[c][0] = acc[c];                                        \
                ys4[c][t] = acc[c];                                       \
            }                                                             \
        }                                                                 \
    } else {                                                              \
        for (size_t t = 0; t < n; ++t) {                                  \
            double acc[4];                                                \
            for (int c = 0; c < 4; ++c) {                                 \
                for (int i = P - 1; i > 0; --i) {                         \
                    xs[c][i] = xs[c][i - 1];                              \
                    ys[c][i] = ys[c][i - 1];                              \
                }                                                         \
                xs[c][0] = (double)xs4[c][t * stride];                    \
                acc[c] = dc[0] * xs[c][0];                                \
            }                                                             \
            for (int i = 1; i < P; ++i)                                   \
                for (int c = 0; c < 4; ++c) {                             \
                    acc[c] += dc[i] * xs[c][i];                           \
                    acc[c] -= nc[i] * ys[c][i];                           \
                }                                                         \
            for (int c = 0; c < 4; ++c) {                                 \
                ys[c][0] = acc[c];                                        \
                ys4[c][t] = acc[c];                                       \
            }                                                             \
        }                                                                 \
    }                                                                     \
    for (int c = 0; c < 4; ++c)                                           \
        for (int i = 0; i < P; ++i) {                                     \
            xz4[c][i] = xs[c][i];                                         \
            yz4[c][i] = ys[c][i];                                         \
        }                                                                 \
}

RN_IIR_UNROLL4S(2)
RN_IIR_UNROLL4S(3)
RN_IIR_UNROLL4S(4)
RN_IIR_UNROLL4S(5)

// Strided-int32 group entry: 4-way interleaved when possible, else a
// per-channel serial pass over a scratch double span.
static void iir_channels4s(const int32_t* const* xs4, size_t stride,
                           size_t nch, size_t n, const double* nc,
                           const double* dc, int p, double* const* xz4,
                           double* const* yz4, int opt,
                           double* const* ys4) {
    if (nch == 4 && p >= 2 && p <= 5) {
        switch (p) {
            case 2: iir_arr4s_2(xs4, stride, n, nc, dc, xz4, yz4, opt,
                                ys4); return;
            case 3: iir_arr4s_3(xs4, stride, n, nc, dc, xz4, yz4, opt,
                                ys4); return;
            case 4: iir_arr4s_4(xs4, stride, n, nc, dc, xz4, yz4, opt,
                                ys4); return;
            case 5: iir_arr4s_5(xs4, stride, n, nc, dc, xz4, yz4, opt,
                                ys4); return;
        }
    }
    static thread_local std::vector<double> xtmp;
    xtmp.resize(n);
    for (size_t c = 0; c < nch; ++c) {
        for (size_t t = 0; t < n; ++t)
            xtmp[t] = (double)xs4[c][t * stride];
        rn_iir_filter_array(xtmp.data(), n, nc, dc, p, xz4[c], yz4[c],
                            opt, ys4[c]);
    }
}

// Filter a group of `nch` (<= 4) channels through the interleaved
// kernel; falls back to per-channel serial calls for orders without a
// fixed-order body. Outputs bit-exact vs per-channel calls.
static void iir_channels4(const double** xs4, size_t nch, size_t n,
                          const double* nc, const double* dc, int p,
                          double** xz4, double** yz4, int opt,
                          double** ys4) {
    if (nch == 4 && p >= 2 && p <= 5) {
        switch (p) {
            case 2: iir_arr4_2(xs4, n, nc, dc, xz4, yz4, opt, ys4); return;
            case 3: iir_arr4_3(xs4, n, nc, dc, xz4, yz4, opt, ys4); return;
            case 4: iir_arr4_4(xs4, n, nc, dc, xz4, yz4, opt, ys4); return;
            case 5: iir_arr4_5(xs4, n, nc, dc, xz4, yz4, opt, ys4); return;
        }
    }
    for (size_t c = 0; c < nch; ++c)
        rn_iir_filter_array(xs4[c], n, nc, dc, p, xz4[c], yz4[c], opt,
                            ys4[c]);
}

// All channels in one call, threaded across channels. Each channel is
// an independent serial recurrence, so per-channel arithmetic (and
// therefore the output bits) is identical to rn_iir_filter_array run
// channel-by-channel — threading only removes the Python call overhead
// and runs channels concurrently (iir_filter.cpp:81-107 semantics).
void rn_iir_filter_channels(const double* x, size_t ch, size_t n,
                            const double* nc, const double* dc, int p,
                            double* xz, double* yz, int opt, double* y,
                            int nthreads) {
    if (nthreads <= 0) nthreads = (int)std::thread::hardware_concurrency();
    auto work = [&](size_t j0, size_t j1) {
        for (size_t j = j0; j < j1; ++j)
            rn_iir_filter_array(x + j * n, n, nc, dc, p,
                                xz + j * (size_t)p, yz + j * (size_t)p,
                                opt, y + j * n);
    };
    if (nthreads <= 1 || ch <= 1) {
        work(0, ch);
    } else {
        size_t nt = (size_t)nthreads < ch ? (size_t)nthreads : ch;
        std::vector<std::thread> ts;
        for (size_t t = 0; t < nt; ++t)
            ts.emplace_back(work, ch * t / nt, ch * (t + 1) / nt);
        for (auto& th : ts) th.join();
    }
}

// Fused streaming hot path (BASELINE config 5, rspt_test.cpp:114-137
// usage): interleaved native span -> per-channel IIR filter (f64,
// reference accumulation order, state carried in/out) -> C (int)
// truncation -> per-frame xdelta preprocess with sequential
// verify-and-grow plane counts (signal_packer_xdelta_hzr.cpp:59-71
// member-state semantics across frames) -> per-(frame,plane,block)
// hzr encode, all inside one thread pool. Each frame's container
// ([method 0][per plane: u32 len + hzr stream]) is byte-identical to
// a sequential per-frame filter+compress pipeline.
//   out: nframes * frame_stride bytes; frame_lens/frame_planes out.
//   p == 0 -> no filter (convert + pack only).
// Returns the final plane count (>0) or -1 on error.
int rn_stream_filter_pack(const uint8_t* src, size_t ns, size_t nframes,
                          size_t ch, size_t bps, const double* nc,
                          const double* dc, int p, double* xz, double* yz,
                          int opt, int nr_planes_in, uint8_t* out,
                          size_t frame_stride, size_t* frame_lens,
                          int32_t* frame_planes, int nthreads) {
    const bool auto_nt = nthreads <= 0;
    if (nthreads <= 0) nthreads = (int)std::thread::hardware_concurrency();
    const size_t N = ns * nframes;  // samples per channel in the span
    const size_t F = ch * ns;       // flat values per frame
    if (N == 0 || ch == 0) return -1;
    // RSPT_STREAM_PROFILE=1: per-stage wall times on stderr
    const bool prof = std::getenv("RSPT_STREAM_PROFILE") != nullptr;
    auto tprev = std::chrono::steady_clock::now();
    auto mark = [&](const char* name) {
        if (!prof) return;
        auto now = std::chrono::steady_clock::now();
        fprintf(stderr, "rn_stream %-10s %.3f ms\n", name,
                std::chrono::duration<double>(now - tprev).count() * 1e3);
        tprev = now;
    };
    // call-reused arenas: fresh multi-MB vectors every call cost more
    // in page faults + zeroing than some compute stages
    static thread_local std::vector<int32_t> sig;
    static thread_local std::vector<double> xall;
    static thread_local std::vector<uint8_t> planes;
    static thread_local std::vector<uint8_t> scratch;
    sig.resize((size_t)ch * N);  // channel-major, filtered
    // thread_local variables are NOT captured by [&] lambdas — worker
    // threads would see their own (empty) instances; capture raw
    // pointers instead
    int32_t* const sig_p = sig.data();

    // ---- pipelined span path (filter present): one producer thread
    // streams the cross-channel vectorized IIR frame-by-frame while
    // the other threads preprocess + encode frames as they appear —
    // the three serial stage barriers of the fallback path overlap
    // into max(filter, drain) instead of their sum. Frames are byte-
    // identical: per-frame work is the same code on the same bytes.
    // RSPT_STREAM_NOPIPE=1 forces the staged fallback (A/B tool).
    if (p > 0 && !std::getenv("RSPT_STREAM_NOPIPE")) {
        // auto mode: oversubscribe the pipeline pool — the producer
        // thread is FP-latency-bound on the serial IIR and leaves
        // bubbles the extra consumers fill (measured 637 -> 756 MB/s
        // at 2x on the 4-core host; explicit nthreads is respected)
        if (auto_nt) nthreads *= 2;
        const int shift2 = (int)(32 - 8 * bps);
        // bps==4: the interleaved source IS little-endian int32s — the
        // producer's strided kernel converts in-register, no convert
        // stage and no materialized double span at all
        const bool direct = bps == 4 && ((uintptr_t)src & 3) == 0;
        double* xa = nullptr;
        if (!direct) {
            xall.resize((size_t)ch * N);   // channel-major doubles
            xa = xall.data();
            auto cvt = [&](size_t t0, size_t t1) {
                for (size_t t = t0; t < t1; ++t) {
                    const uint8_t* q = src + t * ch * bps;
                    for (size_t j = 0; j < ch; ++j) {
                        uint32_t v = 0;
                        for (size_t k = 0; k < bps; ++k)
                            v |= (uint32_t)q[j * bps + k] << (8 * k);
                        xa[j * N + t] =
                            (double)((int32_t)(v << shift2) >> shift2);
                    }
                }
            };
            pool_ranges(N, (size_t)nthreads, cvt);
        }
        mark("convert");

        int np = nr_planes_in < 1 ? 1 : nr_planes_in;
        planes.resize((size_t)nframes * 4 * F);
        uint8_t* const planes_p2 = planes.data();
        // filtered doubles, frame-channel-major; the (int) truncation
        // is fused into the consumers' preprocess pass so the serial
        // producer only runs the recurrence itself
        static thread_local std::vector<double> yall;
        yall.resize((size_t)ch * N);
        double* const yd_p = yall.data();
        size_t nb_per = (F + kMaxBlockSize - 1) / kMaxBlockSize;
        if (nb_per == 0) nb_per = 1;
        static thread_local std::vector<uint32_t> hists_pipe;
        hists_pipe.resize((size_t)nframes * 4 * nb_per * kNumSyms);
        uint32_t* const hists_p2 = hists_pipe.data();
        size_t bcap = kMaxBlockSize + kBlockHeaderSize + 16;
        const size_t ipf = 4 * nb_per;  // item stride (4-plane cap)
        scratch.resize((size_t)nframes * ipf * bcap);
        uint8_t* const scratch_p2 = scratch.data();
        std::vector<size_t> blens((size_t)nframes * ipf, 0);
        std::vector<int> rcs((size_t)nframes * ipf, 0);

        std::unique_ptr<std::atomic<int>[]> pre_state(
            new std::atomic<int>[nframes]);
        for (size_t f = 0; f < nframes; ++f) pre_state[f].store(0);
        std::atomic<size_t> filtered(0), next_pre(0), settled(0),
            next_enc(0), enc_done(0), pre_done(0);
        std::atomic<long long> pre_ns(0), enc_ns(0);  // core-time sums

        auto preprocess_frame = [&, planes_p2, yd_p,
                                 hists_p2](size_t f, int npl) -> int {
            const int sh_fit = 32 - 8 * npl;
            uint8_t* pl = planes_p2 + f * 4 * F;
            static thread_local std::vector<int32_t> xbuf2;
            xbuf2.resize(F);
            int32_t* xb = xbuf2.data();
            const double* vd = yd_p + f * F;
            // vectorizable passes (a fused rolling-register loop
            // measured no faster — the serial regs defeat SIMD):
            // truncate, then the xdelta chain via shifted neighbor
            // loads, with the fit check folded into the same pass
            static thread_local std::vector<int32_t> vbuf2;
            vbuf2.resize(F);
            int32_t* vb = vbuf2.data();
            for (size_t i2 = 0; i2 < F; ++i2)
                vb[i2] = (int32_t)vd[i2];
            uint32_t bad = 0;
            xb[0] = (int32_t)((uint32_t)vb[0] - 128u);
            if (F > 1)
                xb[1] = (int32_t)(((uint32_t)vb[1] - (uint32_t)vb[0]
                                   - 128u)
                                  ^ ((uint32_t)vb[0] - 128u));
            for (size_t i2 = 2; i2 < F; ++i2) {
                uint32_t d = (uint32_t)vb[i2] - (uint32_t)vb[i2 - 1]
                             - 128u;
                uint32_t dm1 = (uint32_t)vb[i2 - 1]
                               - (uint32_t)vb[i2 - 2] - 128u;
                int32_t x = (int32_t)(d ^ dm1);
                xb[i2] = x;
                bad |= (uint32_t)(
                    ((int32_t)((uint32_t)x << sh_fit) >> sh_fit) != x);
            }
            for (size_t i2 = 0; i2 < (F < 2 ? F : 2); ++i2)
                bad |= (uint32_t)(
                    ((int32_t)((uint32_t)xb[i2] << sh_fit) >> sh_fit)
                    != xb[i2]);
            int lfit = (npl < 4 && bad) ? 0 : 1;
            for (int k = 0; k < npl; ++k) {
                uint8_t* pk = pl + (size_t)k * F;
                for (size_t i2 = 0; i2 < F; ++i2)
                    pk[i2] = (uint8_t)((uint32_t)xb[i2] >> (8 * k));
            }
            for (int k = 0; k < npl; ++k)
                for (size_t b = 0; b < nb_per; ++b) {
                    size_t off = b * kMaxBlockSize;
                    if (off >= F) break;
                    size_t blen = F - off < kMaxBlockSize
                                      ? F - off : kMaxBlockSize;
                    histogram_runs(
                        pl + (size_t)k * F + off, blen,
                        hists_p2 + ((f * 4 + (size_t)k) * nb_per + b)
                            * (size_t)kNumSyms);
                }
            return lfit;
        };

        auto encode_item = [&, planes_p2, hists_p2,
                            scratch_p2](size_t i) {
            size_t f = i / ipf;
            size_t k = (i % ipf) / nb_per;
            size_t b = i % nb_per;
            size_t off = b * kMaxBlockSize;
            size_t blen = F - off < kMaxBlockSize ? F - off
                                                  : kMaxBlockSize;
            const uint8_t* pl = planes_p2 + f * 4 * F + k * F + off;
            const uint32_t* h = hists_p2
                + ((f * 4 + k) * nb_per + b) * (size_t)kNumSyms;
            size_t r = encode_block_hist(pl, blen, h,
                                         scratch_p2 + i * bcap, bcap);
            if (!r) rcs[i] = 1;
            blens[i] = r;
        };
        auto enc_live = [&](size_t i) {
            return (i % ipf) < (size_t)np * nb_per;
        };

        double iir_ms = 0.0;
        auto worker = [&](int slot) {
            if (slot == 0) {
                // producer: the proven register-unrolled per-channel
                // serial kernel, one FRAME at a time (state carries
                // across frames exactly as one whole-span call — the
                // recurrence sees the same sample sequence), writing
                // the frame-channel-major layout preprocess reads
                auto t0p = std::chrono::steady_clock::now();
                const int32_t* srci = (const int32_t*)src;
                for (size_t f = 0; f < nframes; ++f) {
                    double* dst = yd_p + f * F;
                    for (size_t j0 = 0; j0 < ch; j0 += 4) {
                        size_t nch = ch - j0 < 4 ? ch - j0 : 4;
                        double *xz4[4], *yz4[4], *ys4[4];
                        for (size_t c = 0; c < nch; ++c) {
                            xz4[c] = xz + (j0 + c) * (size_t)p;
                            yz4[c] = yz + (j0 + c) * (size_t)p;
                            ys4[c] = dst + (j0 + c) * ns;
                        }
                        if (direct) {
                            const int32_t* xi4[4];
                            for (size_t c = 0; c < nch; ++c)
                                xi4[c] = srci + f * ns * ch + j0 + c;
                            iir_channels4s(xi4, ch, nch, ns, nc, dc, p,
                                           xz4, yz4, opt, ys4);
                        } else {
                            const double* xs4[4];
                            for (size_t c = 0; c < nch; ++c)
                                xs4[c] = xa + (j0 + c) * N + f * ns;
                            iir_channels4(xs4, nch, ns, nc, dc, p,
                                          xz4, yz4, opt, ys4);
                        }
                    }
                    filtered.store(f + 1, std::memory_order_release);
                }
                iir_ms = std::chrono::duration<double>(
                    std::chrono::steady_clock::now() - t0p).count()
                    * 1e3;
            }
            for (;;) {
                size_t s = settled.load(std::memory_order_acquire);
                while (s < nframes && pre_state[s].load(
                           std::memory_order_acquire) == 2) {
                    settled.compare_exchange_weak(s, s + 1);
                    s = settled.load(std::memory_order_acquire);
                }
                // preprocess first: it UNLOCKS encode work, so
                // draining it keeps the pool fed (encode has no
                // downstream consumer)
                bool worked = false;
                size_t f = next_pre.load(std::memory_order_relaxed);
                while (f < nframes && f < filtered.load(
                           std::memory_order_acquire)) {
                    if (next_pre.compare_exchange_weak(f, f + 1)) {
                        auto w0 = std::chrono::steady_clock::now();
                        int fit = preprocess_frame(f, np);
                        if (prof)
                            pre_ns.fetch_add(
                                (long long)std::chrono::duration<
                                    double, std::nano>(
                                    std::chrono::steady_clock::now()
                                    - w0).count());
                        pre_state[f].store(fit ? 2 : 3,
                                           std::memory_order_release);
                        pre_done.fetch_add(1,
                                           std::memory_order_acq_rel);
                        worked = true;
                        break;
                    }
                }
                if (worked) continue;
                size_t limit = s * ipf;
                size_t e = next_enc.load(std::memory_order_relaxed);
                while (e < limit) {
                    if (next_enc.compare_exchange_weak(e, e + 1)) {
                        if (enc_live(e)) {
                            auto w0 = std::chrono::steady_clock::now();
                            encode_item(e);
                            if (prof)
                                enc_ns.fetch_add(
                                    (long long)std::chrono::duration<
                                        double, std::nano>(
                                        std::chrono::steady_clock::now()
                                        - w0).count());
                        }
                        enc_done.fetch_add(1,
                                           std::memory_order_acq_rel);
                        worked = true;
                        break;
                    }
                }
                if (worked) continue;
                if (pre_done.load(std::memory_order_acquire)
                        == nframes) {
                    size_t s2 = settled.load(std::memory_order_acquire);
                    bool stalled = s2 >= nframes
                        || pre_state[s2].load(
                               std::memory_order_acquire) == 3;
                    if (stalled
                        && enc_done.load(std::memory_order_acquire)
                               >= s2 * ipf)
                        break;
                }
                std::this_thread::yield();
            }
        };
        {
            std::function<void(int)> slot = [&](int sl) { worker(sl); };
            ThreadPool::inst().run(nthreads, slot);
        }

        size_t s_ok = settled.load();
        for (size_t f = 0; f < s_ok; ++f) frame_planes[f] = np;
        // verify-and-grow tail (rare: plane growth is a once-per-
        // stream event): frames from the first non-fitting one redo
        // preprocess+encode at the grown count, matching the
        // reference's member-state semantics
        // (signal_packer_xdelta_hzr.cpp:59-71)
        size_t f0b = s_ok;
        while (f0b < nframes) {
            ++np;
            if (np > 4) return -1;
            std::vector<int> fit2(nframes, 1);
            std::atomic<size_t> nf2(f0b);
            {
                size_t nleft = nframes - f0b;
                size_t nt = (size_t)nthreads < nleft
                                ? (size_t)nthreads : nleft;
                std::function<void(int)> gs = [&](int) {
                    size_t f;
                    while ((f = nf2.fetch_add(1)) < nframes)
                        fit2[f] = preprocess_frame(f, np);
                };
                ThreadPool::inst().run((int)nt, gs);
            }
            size_t fail = nframes;
            for (size_t f = f0b; f < nframes; ++f)
                if (!fit2[f]) { fail = f; break; }
            for (size_t f = f0b; f < fail; ++f) frame_planes[f] = np;
            std::vector<size_t> items2;
            for (size_t f = f0b; f < fail; ++f)
                for (int k = 0; k < np; ++k)
                    for (size_t b = 0; b < nb_per; ++b)
                        items2.push_back(f * ipf + (size_t)k * nb_per
                                         + b);
            if (!items2.empty()) {
                std::atomic<size_t> ni2(0);
                size_t nt = (size_t)nthreads < items2.size()
                                ? (size_t)nthreads : items2.size();
                std::function<void(int)> es = [&](int) {
                    size_t q;
                    while ((q = ni2.fetch_add(1)) < items2.size())
                        encode_item(items2[q]);
                };
                ThreadPool::inst().run((int)nt, es);
            }
            f0b = fail;
        }
        for (size_t i = 0; i < (size_t)nframes * ipf; ++i)
            if (rcs[i]) return -1;
        if (prof)
            fprintf(stderr,
                    "rn_stream %-10s %.3f ms (core: pre %.3f enc %.3f)\n",
                    "iir(solo)", iir_ms, pre_ns.load() / 1e6,
                    enc_ns.load() / 1e6);
        mark("pipe(f+p+e)");

        size_t nb_per_a = nb_per;
        for (size_t f = 0; f < nframes; ++f) {
            uint8_t* dst = out + f * frame_stride;
            size_t pos = 0;
            dst[pos++] = 0;  // method byte (signal_packer_hzr.cpp:54)
            for (int k = 0; k < frame_planes[f]; ++k) {
                size_t chunk_start = pos;
                pos += 4;
                uint32_t total = (uint32_t)F;
                if (pos + 4 > frame_stride) return -1;
                memcpy(dst + pos, &total, 4);
                pos += 4;
                for (size_t b = 0; b < nb_per_a; ++b) {
                    size_t i = f * ipf + (size_t)k * nb_per_a + b;
                    if (pos + blens[i] > frame_stride) return -1;
                    memcpy(dst + pos, scratch_p2 + i * bcap, blens[i]);
                    pos += blens[i];
                }
                uint32_t clen = (uint32_t)(pos - chunk_start - 4);
                memcpy(dst + chunk_start, &clen, 4);
            }
            frame_lens[f] = pos;
        }
        mark("assemble");
        return np;
    }

    // stage 1a — threads over SAMPLE ranges: one sequential pass over
    // the interleaved bytes, scattered to channel-major (per-channel
    // strided reads re-streamed every cache line ch times — measured
    // ~4x this formulation's cost)
    const int shift = (int)(32 - 8 * bps);
    xall.resize(p > 0 ? (size_t)ch * N : 0);
    double* const xall_p = xall.data();
    {
        auto cvt = [&](size_t t0, size_t t1) {
            if (bps == 4) {  // the samples ARE little-endian int32s
                for (size_t t = t0; t < t1; ++t) {
                    const uint8_t* q = src + t * ch * 4;
                    for (size_t j = 0; j < ch; ++j) {
                        int32_t sv;
                        memcpy(&sv, q + j * 4, 4);
                        if (p > 0)
                            xall_p[j * N + t] = (double)sv;
                        else
                            sig_p[j * N + t] = sv;
                    }
                }
                return;
            }
            for (size_t t = t0; t < t1; ++t) {
                const uint8_t* q = src + t * ch * bps;
                for (size_t j = 0; j < ch; ++j) {
                    uint32_t v = 0;
                    for (size_t k = 0; k < bps; ++k)
                        v |= (uint32_t)q[j * bps + k] << (8 * k);
                    int32_t sv = (int32_t)(v << shift) >> shift;
                    if (p > 0)
                        xall_p[j * N + t] = (double)sv;
                    else
                        sig_p[j * N + t] = sv;
                }
            }
        };
        pool_ranges(N, (size_t)nthreads, cvt);
    }
    mark("convert");

    // stage 1b — threads over channels: serial IIR + (int) truncation
    if (p > 0) {
        auto fwork = [&](size_t j0, size_t j1) {
            std::vector<double> ybuf(N);
            for (size_t j = j0; j < j1; ++j) {
                rn_iir_filter_array(xall_p + j * N, N, nc, dc, p,
                                    xz + j * (size_t)p,
                                    yz + j * (size_t)p, opt, ybuf.data());
                for (size_t t = 0; t < N; ++t)
                    sig_p[j * N + t] = (int32_t)ybuf[t];
            }
        };
        pool_ranges(ch, (size_t)nthreads, fwork);
    }
    mark("iir");

    // stage 2 — xdelta preprocess per frame (independent chains: every
    // frame is its own compress() call, deltas restart at 0), with
    // sequential plane growth: the first non-fitting frame raises the
    // count for itself and all later frames.
    int np = nr_planes_in < 1 ? 1 : nr_planes_in;
    planes.resize((size_t)nframes * 4 * F);  // 4-plane cap
    uint8_t* const planes_p = planes.data();
    size_t nb_per_f = (F + kMaxBlockSize - 1) / kMaxBlockSize;
    if (nb_per_f == 0) nb_per_f = 1;
    // per-(frame, plane, block) histograms, built in the preprocess
    // task right after the frame's plane bytes are written (L2-warm —
    // encode_block then skips its own histogram scan)
    static thread_local std::vector<uint32_t> hists;
    hists.resize((size_t)nframes * 4 * nb_per_f * kNumSyms);
    uint32_t* const hists_p = hists.data();
    std::vector<int> fitv(nframes, 1);
    size_t f0 = 0;
    while (f0 < nframes) {
        std::atomic<size_t> nextf(f0);
        auto pwork = [&]() {
            size_t f;
            while ((f = nextf.fetch_add(1)) < nframes) {
                const int sh_fit = 32 - 8 * np;
                uint8_t* pl = planes_p + f * 4 * F;
                // flat channel-major frame view, then three
                // vectorizable passes (the delta/xor chain looks back
                // only 1-2 elements — neighbor loads, no carried
                // scalar): d = v - v[-1] - 128; x = d ^ d[-1]; planes.
                static thread_local std::vector<int32_t> xbuf;
                xbuf.resize(2 * F);
                int32_t* vb = xbuf.data();
                int32_t* xb = xbuf.data() + F;
                for (size_t c = 0; c < ch; ++c)
                    memcpy(vb + c * ns, sig_p + c * N + f * ns,
                           ns * sizeof(int32_t));
                xb[0] = (int32_t)((uint32_t)vb[0] - 128u);
                if (F > 1)  // d[1] ^ d[0], d[0] = v0 - 0 - 128
                    xb[1] = (int32_t)(((uint32_t)vb[1] - (uint32_t)vb[0]
                                       - 128u)
                                      ^ ((uint32_t)vb[0] - 128u));
                for (size_t i2 = 2; i2 < F; ++i2) {
                    uint32_t d = (uint32_t)vb[i2] - (uint32_t)vb[i2 - 1]
                                 - 128u;
                    uint32_t dm1 = (uint32_t)vb[i2 - 1]
                                   - (uint32_t)vb[i2 - 2] - 128u;
                    xb[i2] = (int32_t)(d ^ dm1);
                }
                int lfit = 1;
                if (np < 4) {
                    uint32_t bad = 0;
                    for (size_t i2 = 0; i2 < F; ++i2)
                        bad |= (uint32_t)(
                            ((int32_t)((uint32_t)xb[i2] << sh_fit)
                             >> sh_fit) != xb[i2]);
                    lfit = bad ? 0 : 1;
                }
                for (int k = 0; k < np; ++k) {
                    uint8_t* pk = pl + (size_t)k * F;
                    for (size_t i2 = 0; i2 < F; ++i2)
                        pk[i2] = (uint8_t)((uint32_t)xb[i2] >> (8 * k));
                }
                fitv[f] = lfit;
                // histogram the L2-warm plane bytes now (run semantics
                // = histogram_runs; encode then skips its own scan)
                for (int k = 0; k < np; ++k)
                    for (size_t b = 0; b < nb_per_f; ++b) {
                        size_t off = b * kMaxBlockSize;
                        if (off >= F) break;
                        size_t blen = F - off < kMaxBlockSize
                                          ? F - off : kMaxBlockSize;
                        histogram_runs(
                            pl + (size_t)k * F + off, blen,
                            hists_p + ((f * 4 + (size_t)k) * nb_per_f
                                       + b) * (size_t)kNumSyms);
                    }
            }
        };
        {
            size_t nleft = nframes - f0;
            size_t nt = (size_t)nthreads < nleft ? (size_t)nthreads : nleft;
            std::function<void(int)> slot = [&](int) { pwork(); };
            ThreadPool::inst().run((int)nt, slot);
        }
        size_t fail = nframes;
        for (size_t f = f0; f < nframes; ++f)
            if (!fitv[f]) { fail = f; break; }
        for (size_t f = f0; f < fail; ++f) frame_planes[f] = np;
        if (fail == nframes) break;
        f0 = fail;
        ++np;
        if (np > 4) return -1;
    }
    mark("preprocess");

    // stage 3 — encode every (frame, plane, block) in one work-steal
    // pool (hzr_encode.c:528-539 block independence)
    size_t nb_per = (F + kMaxBlockSize - 1) / kMaxBlockSize;
    if (nb_per == 0) nb_per = 1;
    std::vector<size_t> item_f, item_k, item_b;
    for (size_t f = 0; f < nframes; ++f)
        for (int k = 0; k < frame_planes[f]; ++k)
            for (size_t b = 0; b < nb_per; ++b) {
                item_f.push_back(f);
                item_k.push_back((size_t)k);
                item_b.push_back(b);
            }
    size_t nitems = item_f.size();
    size_t bcap = kMaxBlockSize + kBlockHeaderSize + 16;
    scratch.resize(nitems * bcap);
    uint8_t* const scratch_p = scratch.data();
    std::vector<size_t> blens(nitems, 0);
    std::vector<int> rcs(nitems, 0);
    std::atomic<size_t> next(0);
    auto ework = [&]() {
        size_t i;
        while ((i = next.fetch_add(1)) < nitems) {
            size_t off = item_b[i] * kMaxBlockSize;
            size_t blen = F - off < kMaxBlockSize ? F - off : kMaxBlockSize;
            const uint8_t* pl = planes_p + item_f[i] * 4 * F +
                                item_k[i] * F + off;
            const uint32_t* h = hists_p +
                ((item_f[i] * 4 + item_k[i]) * nb_per_f + item_b[i]) *
                    (size_t)kNumSyms;
            size_t r = encode_block_hist(pl, blen, h,
                                         scratch_p + i * bcap, bcap);
            if (!r) rcs[i] = 1;
            blens[i] = r;
        }
    };
    {
        size_t nt = (size_t)nthreads < nitems ? (size_t)nthreads : nitems;
        std::function<void(int)> slot = [&](int) { ework(); };
        ThreadPool::inst().run((int)nt, slot);
    }
    for (size_t i = 0; i < nitems; ++i)
        if (rcs[i]) return -1;
    mark("encode");

    // assembly: per frame [method 0][per plane: u32 chunk_len,
    // u32 decoded_size, blocks...]
    size_t item = 0;
    for (size_t f = 0; f < nframes; ++f) {
        uint8_t* dst = out + f * frame_stride;
        size_t pos = 0;
        dst[pos++] = 0;  // method byte (signal_packer_hzr.cpp:54)
        for (int k = 0; k < frame_planes[f]; ++k) {
            size_t chunk_start = pos;
            pos += 4;  // chunk length placeholder
            uint32_t total = (uint32_t)F;
            if (pos + 4 > frame_stride) return -1;
            memcpy(dst + pos, &total, 4);
            pos += 4;
            for (size_t b = 0; b < nb_per; ++b, ++item) {
                if (pos + blens[item] > frame_stride) return -1;
                memcpy(dst + pos, scratch.data() + item * bcap,
                       blens[item]);
                pos += blens[item];
            }
            uint32_t clen = (uint32_t)(pos - chunk_start - 4);
            memcpy(dst + chunk_start, &clen, 4);
        }
        frame_lens[f] = pos;
    }
    mark("assemble");
    return np;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// LZ4 block codec — clean-room implementation of the public LZ4 block
// format. The reference vendors lz4.c/lz4hc.c as a dormant alternate
// plane backend (signal_packer_base.cpp:26-28,73-76,107-109 — the calls
// are commented out). Here the backend is live: the container dispatches
// it per stream via the method byte's 0x40 flag (packers/container.py).
//
// Format (spec, not code, from the LZ4 block format description):
//   sequence := token(1B: hi nibble literal_len, lo nibble match_len-4)
//               [literal_len ext: 255* then <255] literals
//               offset(2B LE, 1..65535) [match_len ext: 255* then <255]
//   last sequence is literals-only; encoder must keep the final 5 bytes
//   as literals and start no match within the final 12 bytes.
// Interop with the reference's vendored lz4.c is tested both directions
// (tests/test_lz4.py).
// ---------------------------------------------------------------------------

namespace lz4blk {

constexpr int kHashLog = 16;
constexpr size_t kMinMatch = 4;
constexpr size_t kLastLiterals = 5;
constexpr size_t kMfLimit = 12;
constexpr size_t kMaxOffset = 65535;

static inline uint32_t rd32(const uint8_t* p) {
    uint32_t v;
    std::memcpy(&v, p, 4);
    return v;
}

static inline uint32_t hash4(uint32_t v) {
    return (v * 2654435761u) >> (32 - kHashLog);
}

// 5-byte hash: fewer collisions than 4-byte on low-entropy data, so the
// stored candidate is likelier to extend into a long match.
static inline uint32_t hash5(const uint8_t* p) {
    uint64_t v;
    std::memcpy(&v, p, 8);
    return (uint32_t)(((v << 24) * 889523592379ull) >> (64 - kHashLog));
}

// Length of the common prefix of [a, alimit) and the run at b (b < a).
static inline size_t run_fwd(const uint8_t* a, const uint8_t* b,
                             const uint8_t* alimit) {
    const uint8_t* a0 = a;
    while (a + 8 <= alimit) {
        uint64_t xa, xb;
        std::memcpy(&xa, a, 8);
        std::memcpy(&xb, b, 8);
        uint64_t x = xa ^ xb;
        if (x) return (size_t)(a - a0) + ((size_t)__builtin_ctzll(x) >> 3);
        a += 8;
        b += 8;
    }
    while (a < alimit && *a == *b) {
        ++a;
        ++b;
    }
    return (size_t)(a - a0);
}

}  // namespace lz4blk

extern "C" {

long long rspt_lz4_max_compressed(long long n) {
    return n + n / 255 + 16;
}

// Greedy hash-table compressor (LZ4_compress_default class). Returns the
// compressed size, or 0 if dst is too small.
long long rspt_lz4_compress(const uint8_t* src, long long n_, uint8_t* dst,
                            long long cap_) {
    using namespace lz4blk;
    if (n_ < 0 || cap_ <= 0) return 0;
    const size_t n = (size_t)n_;
    uint8_t* op = dst;
    uint8_t* const oend = dst + (size_t)cap_;
    const uint8_t* ip = src;
    const uint8_t* const iend = src + n;
    const uint8_t* anchor = src;

    auto emit_last = [&]() -> long long {
        size_t lit = (size_t)(iend - anchor);
        if ((size_t)(oend - op) < 1 + lit / 255 + 1 + lit) return 0;
        size_t l = lit;
        if (l >= 15) {
            *op++ = 0xF0;
            l -= 15;
            while (l >= 255) {
                *op++ = 255;
                l -= 255;
            }
            *op++ = (uint8_t)l;
        } else {
            *op++ = (uint8_t)(l << 4);
        }
        std::memcpy(op, anchor, lit);
        op += lit;
        return (long long)(op - dst);
    };

    if (n <= kMfLimit) return emit_last();

    std::vector<uint32_t> htab((size_t)1 << kHashLog, 0);
    const uint8_t* const mflimit = iend - kMfLimit;
    const uint8_t* const matchlimit = iend - kLastLiterals;

    htab[hash5(ip)] = 0;
    ++ip;

    for (;;) {
        // -- find a match (skip-accelerated probe) --
        const uint8_t* cand;
        uint32_t probes = 1u << 6;
        for (;;) {
            if (ip > mflimit) return emit_last();
            uint32_t h = hash5(ip);
            cand = src + htab[h];
            htab[h] = (uint32_t)(ip - src);
            if (cand < ip && (size_t)(ip - cand) <= kMaxOffset &&
                rd32(cand) == rd32(ip))
                break;
            ip += (probes++ >> 6);
        }

        // -- extend backwards over pending literals --
        while (ip > anchor && cand > src && ip[-1] == cand[-1]) {
            --ip;
            --cand;
        }

        size_t lit = (size_t)(ip - anchor);
        size_t mlen =
            kMinMatch + run_fwd(ip + kMinMatch, cand + kMinMatch, matchlimit);
        size_t off = (size_t)(ip - cand);

        size_t need = 1 + lit / 255 + 1 + lit + 2 + (mlen - kMinMatch) / 255 +
                      1 + kLastLiterals + 2;
        if ((size_t)(oend - op) < need) return 0;

        uint8_t* token = op++;
        size_t l = lit;
        if (l >= 15) {
            *token = 0xF0;
            l -= 15;
            while (l >= 255) {
                *op++ = 255;
                l -= 255;
            }
            *op++ = (uint8_t)l;
        } else {
            *token = (uint8_t)(l << 4);
        }
        std::memcpy(op, anchor, lit);
        op += lit;

        uint16_t off16 = (uint16_t)off;
        std::memcpy(op, &off16, 2);
        op += 2;

        size_t m = mlen - kMinMatch;
        if (m >= 15) {
            *token |= 15;
            m -= 15;
            while (m >= 255) {
                *op++ = 255;
                m -= 255;
            }
            *op++ = (uint8_t)m;
        } else {
            *token |= (uint8_t)m;
        }

        ip += mlen;
        anchor = ip;
        if (ip > mflimit) return emit_last();
        // refresh the table near the match tail so runs keep chaining
        htab[hash5(ip - 2)] = (uint32_t)(ip - 2 - src);
    }
}

// High-compression variant (LZ4HC class): depth-bounded hash-CHAIN
// candidate search with one-step lazy matching — the standard
// chain+lazy design, written to the same public block format (any
// spec-valid stream interoperates with any decoder). Bigger depth =
// better parse = smaller output at more search cost; the greedy
// single-probe compressor above stays the speed path.
long long rspt_lz4_compress_hc(const uint8_t* src, long long n_,
                               uint8_t* dst, long long cap_, int depth) {
    using namespace lz4blk;
    if (n_ < 0 || cap_ <= 0) return 0;
    if (depth <= 0) depth = 256;
    const size_t n = (size_t)n_;
    uint8_t* op = dst;
    uint8_t* const oend = dst + (size_t)cap_;
    const uint8_t* ip = src;
    const uint8_t* const iend = src + n;
    const uint8_t* anchor = src;

    auto emit_last = [&]() -> long long {
        size_t lit = (size_t)(iend - anchor);
        if ((size_t)(oend - op) < 1 + lit / 255 + 1 + lit) return 0;
        size_t l = lit;
        if (l >= 15) {
            *op++ = 0xF0;
            l -= 15;
            while (l >= 255) {
                *op++ = 255;
                l -= 255;
            }
            *op++ = (uint8_t)l;
        } else {
            *op++ = (uint8_t)(l << 4);
        }
        std::memcpy(op, anchor, lit);
        op += lit;
        return (long long)(op - dst);
    };

    if (n <= kMfLimit) return emit_last();
    const uint8_t* const mflimit = iend - kMfLimit;
    const uint8_t* const matchlimit = iend - kLastLiterals;

    std::vector<int32_t> head((size_t)1 << kHashLog, -1);
    std::vector<int32_t> chain(n, -1);
    auto insert = [&](const uint8_t* p) {
        uint32_t h = hash4(rd32(p));
        int32_t pos = (int32_t)(p - src);
        if (head[h] == pos) return;  // no self-loops
        chain[pos] = head[h];
        head[h] = pos;
    };
    auto best_match = [&](const uint8_t* p,
                          const uint8_t** bcand) -> size_t {
        size_t best = 0;
        int32_t cand = head[hash4(rd32(p))];
        int d = depth;
        while (cand >= 0 && d-- > 0) {
            const uint8_t* cp = src + cand;
            if ((size_t)(p - cp) > kMaxOffset) break;  // older = farther
            if (rd32(cp) == rd32(p)) {
                size_t len = kMinMatch + run_fwd(p + kMinMatch,
                                                 cp + kMinMatch,
                                                 matchlimit);
                if (len > best) {
                    best = len;
                    *bcand = cp;
                }
            }
            cand = chain[cand];
        }
        return best >= kMinMatch ? best : 0;
    };

    insert(ip);
    ++ip;
    while (ip <= mflimit) {
        const uint8_t* cand = nullptr;
        size_t mlen = best_match(ip, &cand);
        if (!mlen) {
            insert(ip);
            ++ip;
            continue;
        }
        // one-step lazy deferral: a strictly longer match starting one
        // byte later buys more than the literal it costs
        while (ip + 1 <= mflimit) {
            insert(ip);
            const uint8_t* cand2 = nullptr;
            size_t m2 = best_match(ip + 1, &cand2);
            if (m2 > mlen + 1) {
                ++ip;
                mlen = m2;
                cand = cand2;
            } else {
                break;
            }
        }
        while (ip > anchor && cand > src && ip[-1] == cand[-1]) {
            --ip;
            --cand;
        }
        size_t lit = (size_t)(ip - anchor);
        size_t off = (size_t)(ip - cand);
        size_t need = 1 + lit / 255 + 1 + lit + 2
                      + (mlen - kMinMatch) / 255 + 1 + kLastLiterals + 2;
        if ((size_t)(oend - op) < need) return 0;
        uint8_t* token = op++;
        size_t l = lit;
        if (l >= 15) {
            *token = 0xF0;
            l -= 15;
            while (l >= 255) {
                *op++ = 255;
                l -= 255;
            }
            *op++ = (uint8_t)l;
        } else {
            *token = (uint8_t)(l << 4);
        }
        std::memcpy(op, anchor, lit);
        op += lit;
        uint16_t off16 = (uint16_t)off;
        std::memcpy(op, &off16, 2);
        op += 2;
        size_t m = mlen - kMinMatch;
        if (m >= 15) {
            *token |= 15;
            m -= 15;
            while (m >= 255) {
                *op++ = 255;
                m -= 255;
            }
            *op++ = (uint8_t)m;
        } else {
            *token |= (uint8_t)m;
        }
        // index every position the match covered (what makes HC find
        // overlapping candidates the greedy single-slot table misses)
        const uint8_t* p2 = ip + 1;
        const uint8_t* stop = ip + mlen < mflimit ? ip + mlen : mflimit;
        for (; p2 < stop; ++p2) insert(p2);
        ip += mlen;
        anchor = ip;
    }
    return emit_last();
}

// Bounds-checked decompressor (LZ4_decompress_safe class). Returns the
// decoded size, or -1 on malformed input / overflow.
long long rspt_lz4_decompress(const uint8_t* src, long long n_, uint8_t* dst,
                              long long cap_) {
    using namespace lz4blk;
    if (n_ <= 0 || cap_ < 0) return -1;
    const uint8_t* ip = src;
    const uint8_t* const iend = src + (size_t)n_;
    uint8_t* op = dst;
    uint8_t* const oend = dst + (size_t)cap_;

    for (;;) {
        if (ip >= iend) return -1;
        uint32_t token = *ip++;
        size_t lit = token >> 4;
        if (lit == 15) {
            uint32_t b;
            do {
                if (ip >= iend) return -1;
                b = *ip++;
                lit += b;
            } while (b == 255);
        }
        if ((size_t)(iend - ip) < lit || (size_t)(oend - op) < lit) return -1;
        std::memcpy(op, ip, lit);
        op += lit;
        ip += lit;
        if (ip == iend) break;  // last sequence: literals only

        if ((size_t)(iend - ip) < 2) return -1;
        uint16_t off16;
        std::memcpy(&off16, ip, 2);
        ip += 2;
        size_t off = off16;
        if (off == 0 || (size_t)(op - dst) < off) return -1;

        size_t mlen = (token & 15) + kMinMatch;
        if ((token & 15) == 15) {
            uint32_t b;
            do {
                if (ip >= iend) return -1;
                b = *ip++;
                mlen += b;
            } while (b == 255);
        }
        if ((size_t)(oend - op) < mlen) return -1;
        const uint8_t* mp = op - off;
        if (off >= 8) {
            size_t i = 0;
            for (; i + 8 <= mlen; i += 8) std::memcpy(op + i, mp + i, 8);
            for (; i < mlen; ++i) op[i] = mp[i];
        } else {
            for (size_t i = 0; i < mlen; ++i) op[i] = mp[i];
        }
        op += mlen;
    }
    return (long long)(op - dst);
}

}  // extern "C"
