// Native host PairHMM engine over the dense PairBatch tile layout.
//
// Role: the reference ships a CPU SIMD engine menu (AVX512/AVX2/scalar —
// reference: src/haplotypecaller/pairhmm/pairhmm_engine.cpp:22-53 dispatches
// at startup); this is our host-side member of that menu. The TPU Pallas
// kernel is the flagship; this engine serves (a) pure-CPU runs and (b) the
// small-input fallback on tunnel-attached TPU sessions where a device
// round-trip costs more than the work.
//
// Same recurrence as ops/pairhmm/xla.py:_forward_one (studied from
// reference src/haplotypecaller/pairhmm/rovaca/avx_512_float.cc:29-183,
// implemented fresh): row sweep over read bases, in-row sequential deletion
// recurrence, per-lane read-length termination. Layout matches PairBatch:
//   trans (GR, Lr, 8, 128) f32   channels [mm,gapm,mi,ii,md,dd,distm,1-distm]
//   rbase (GR, Lr, 128)    i32   bitmask base codes, match test (r & h) != 0
//   rlen  (GR, 128)        i32   0 = padding lane
//   hcode (GH, Lh, 8)      i32   hap codes (compact; sublane = hap slot)
//   hlen  (GH, 8)          i32   0 = padding slot
//   out   (GH, GR, 8, 128) f32   raw forward sums (pre-log10)
//
// The 128-lane inner loops carry no cross-lane dependency: g++ -O3
// -march=native autovectorizes them to AVX512 on this host. FTZ+DAZ is set
// per thread, as the reference's engine does (pairhmm_internal.cpp:21-25) —
// without it denormal underflow in the DP tail dominates runtime.

#include <cstdint>
#include <cstdlib>
#include <cstring>

#if defined(__x86_64__) || defined(_M_X64)
#include <immintrin.h>
#endif

namespace {

constexpr int LANES = 128;

struct State {
    // column state rows (hl+1 entries of LANES floats): index 0 = virtual
    // column -1 of the current row
    float* m;
    float* i;
    float* d;
};

void forward_tile(const float* trans, const int32_t* rbase,
                  const int32_t* rlen, const int32_t* hcode, int hl, int Lr,
                  float initial_constant, float* out, State st) {
    int max_rl = 0;
    for (int l = 0; l < LANES; l++)
        if (rlen[l] > max_rl) max_rl = rlen[l];
    if (max_rl == 0 || hl == 0) {
        std::memset(out, 0, sizeof(float) * LANES);
        return;
    }
    const float init_d = initial_constant / (float)hl;
    // virtual row -1: M = I = 0 everywhere, D = init_d everywhere
    std::memset(st.m, 0, sizeof(float) * (size_t)(hl + 1) * LANES);
    std::memset(st.i, 0, sizeof(float) * (size_t)(hl + 1) * LANES);
    for (int j = 0; j <= hl; j++)
        for (int l = 0; l < LANES; l++) st.d[(size_t)j * LANES + l] = init_d;

    float md_buf[LANES], id_buf[LANES], dd_buf[LANES];   // diag (row i-1, j-1)
    float mu_buf[LANES], iu_buf[LANES], du_buf[LANES];   // up   (row i-1, j)
    float rowsum[LANES];
    std::memset(out, 0, sizeof(float) * LANES);

    for (int i = 0; i < max_rl; i++) {
        const float* t = trans + (size_t)i * 8 * LANES;
        const float* mm = t + 0 * LANES;
        const float* gapm = t + 1 * LANES;
        const float* mi = t + 2 * LANES;
        const float* ii = t + 3 * LANES;
        const float* md = t + 4 * LANES;
        const float* dd = t + 5 * LANES;
        const float* distm = t + 6 * LANES;
        const float* one_distm = t + 7 * LANES;
        const int32_t* r = rbase + (size_t)i * LANES;

        // prev-row virtual column -1 becomes this row's first diagonal
        std::memcpy(md_buf, st.m, sizeof(float) * LANES);
        std::memcpy(id_buf, st.i, sizeof(float) * LANES);
        std::memcpy(dd_buf, st.d, sizeof(float) * LANES);
        // current row virtual column -1 is all zero
        std::memset(st.m, 0, sizeof(float) * LANES);
        std::memset(st.i, 0, sizeof(float) * LANES);
        std::memset(st.d, 0, sizeof(float) * LANES);
        std::memset(rowsum, 0, sizeof(float) * LANES);

        for (int j = 1; j <= hl; j++) {
            float* __restrict__ Mj = st.m + (size_t)j * LANES;
            float* __restrict__ Ij = st.i + (size_t)j * LANES;
            float* __restrict__ Dj = st.d + (size_t)j * LANES;
            const float* __restrict__ Ml = st.m + (size_t)(j - 1) * LANES;
            const float* __restrict__ Dl = st.d + (size_t)(j - 1) * LANES;
            std::memcpy(mu_buf, Mj, sizeof(float) * LANES);
            std::memcpy(iu_buf, Ij, sizeof(float) * LANES);
            std::memcpy(du_buf, Dj, sizeof(float) * LANES);
            const int32_t h = hcode[(size_t)(j - 1) * 8];
            for (int l = 0; l < LANES; l++) {
                const float prior = (r[l] & h) ? one_distm[l] : distm[l];
                const float Mnew =
                    prior * (md_buf[l] * mm[l]
                             + (id_buf[l] + dd_buf[l]) * gapm[l]);
                const float Inew = mu_buf[l] * mi[l] + iu_buf[l] * ii[l];
                const float Dnew = Ml[l] * md[l] + Dl[l] * dd[l];
                Mj[l] = Mnew;
                Ij[l] = Inew;
                Dj[l] = Dnew;
                rowsum[l] += Mnew + Inew;
            }
            std::memcpy(md_buf, mu_buf, sizeof(float) * LANES);
            std::memcpy(id_buf, iu_buf, sizeof(float) * LANES);
            std::memcpy(dd_buf, du_buf, sizeof(float) * LANES);
        }
        // lanes whose read ends at this row bank their result (the XLA
        // path's copy-through freeze, realized as record-at-final-row)
        for (int l = 0; l < LANES; l++)
            if (rlen[l] == i + 1) out[l] = rowsum[l];
    }
}

}  // namespace

extern "C" void rovaca_pairhmm_dense(const float* trans, const int32_t* rbase,
                                     const int32_t* rlen,
                                     const int32_t* hcode,
                                     const int32_t* hlen, int GR, int Lr,
                                     int GH, int Lh, float initial_constant,
                                     float* out) {
#pragma omp parallel
    {
#if defined(__x86_64__) || defined(_M_X64)
        // the calling thread participates in the parallel region: restore
        // its MXCSR afterwards, or FTZ+DAZ leaks into the host process
        // (observed: log10(denormal) raising a domain error later)
        const unsigned saved_csr = _mm_getcsr();
        _MM_SET_FLUSH_ZERO_MODE(_MM_FLUSH_ZERO_ON);
#if defined(_MM_DENORMALS_ZERO_ON)
        _MM_SET_DENORMALS_ZERO_MODE(_MM_DENORMALS_ZERO_ON);
#endif
#endif
        State st;
        st.m = (float*)std::aligned_alloc(
            64, sizeof(float) * (size_t)(Lh + 1) * LANES);
        st.i = (float*)std::aligned_alloc(
            64, sizeof(float) * (size_t)(Lh + 1) * LANES);
        st.d = (float*)std::aligned_alloc(
            64, sizeof(float) * (size_t)(Lh + 1) * LANES);
#pragma omp for collapse(3) schedule(dynamic)
        for (int gh = 0; gh < GH; gh++)
            for (int sub = 0; sub < 8; sub++)
                for (int gr = 0; gr < GR; gr++) {
                    float* o = out
                               + (((size_t)gh * GR + gr) * 8 + sub) * LANES;
                    const int hl = hlen[gh * 8 + sub];
                    forward_tile(trans + (size_t)gr * Lr * 8 * LANES,
                                 rbase + (size_t)gr * Lr * LANES,
                                 rlen + (size_t)gr * LANES,
                                 // [ (j-1)*8 ] walks column `sub` of (Lh, 8)
                                 hcode + ((size_t)gh * Lh) * 8 + sub,
                                 hl, Lr, initial_constant, o, st);
                }
        std::free(st.m);
        std::free(st.i);
        std::free(st.d);
#if defined(__x86_64__) || defined(_M_X64)
        _mm_setcsr(saved_csr);
#endif
    }
}
