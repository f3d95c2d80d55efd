// Native batch indel-informativeness for the GVCF reference-confidence
// model. Port of rovaca_tpu/pipeline/ref_confidence.py:_informative_mask
// (reference: src/haplotypecaller/genotype/reference_confidence_model.cpp:
// 25-27 read_has_no_plausible_ideals_of_size over MAX_INDEL_SIZE=10):
// per collapsed read position, the read is indel-informative iff every
// shifted alignment (deletion/insertion of size 1..K after the position)
// has a strictly larger mismatch-quality suffix sum than the current one.
// All shifts live on read-vs-ref diagonals, so one suffix cumsum per
// needed diagonal covers all positions of the read.

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

extern "C" {

// Per read r (concatenated layout via offs/lens): bases/quals/out_mask are
// uint8 arrays, rpl int64 window-local reference indices per read base.
// out_ok[r]=0 flags reads whose needed diagonals leave the reference bounds
// (caller falls back, mirrors the python None return).
void rovaca_informative_mask_batch(
        int n_reads, const uint8_t* bases, const int64_t* offs,
        const int32_t* lens, const uint8_t* quals, const int64_t* rpl,
        const uint8_t* ref, int64_t ref_len, int max_indel,
        uint8_t* out_mask, uint8_t* out_ok) {
#pragma omp parallel
    {
        std::vector<int64_t> diag_keys;
        std::vector<std::vector<int64_t>> suffix;   // per needed diagonal

#pragma omp for schedule(dynamic, 16)
        for (int r = 0; r < n_reads; ++r) {
            const int n = lens[r];
            const uint8_t* rb = bases + offs[r];
            const uint8_t* rq = quals + offs[r];
            const int64_t* rp = rpl + offs[r];
            uint8_t* out = out_mask + offs[r];
            out_ok[r] = 1;
            if (n == 0) continue;

            // unique diagonals of this read's aligned bases
            diag_keys.clear();
            for (int i = 0; i < n; ++i) {
                const int64_t d = rp[i] - i;
                if (diag_keys.empty() || diag_keys.back() != d) {
                    bool seen = false;
                    for (int64_t k : diag_keys) {
                        if (k == d) { seen = true; break; }
                    }
                    if (!seen) diag_keys.push_back(d);
                }
            }
            std::sort(diag_keys.begin(), diag_keys.end());

            // needed shifted diagonals: union of [d-K, d+K]
            const int64_t lo = diag_keys.front() - max_indel;
            const int64_t hi = diag_keys.back() + max_indel;
            const int n_diag = static_cast<int>(hi - lo + 1);
            if (static_cast<size_t>(n_diag) > suffix.size())
                suffix.resize(n_diag);

            bool oob = false;
            for (int64_t e = lo; e <= hi && !oob; ++e) {
                if (e < 0 || e + n - 1 >= ref_len) { oob = true; break; }
                auto& s = suffix[e - lo];
                s.assign(n + max_indel + 1, 0);
                int64_t acc = 0;
                for (int i = n - 1; i >= 0; --i) {
                    if (rb[i] != ref[e + i]) acc += rq[i];
                    s[i] = acc;
                }
            }
            if (oob) {
                out_ok[r] = 0;
                std::memset(out, 0, n);
                continue;
            }

            for (int64_t d : diag_keys) {
                const auto& base = suffix[d - lo];
                for (int i = 0; i < n; ++i) {
                    if (rp[i] - i != d) continue;
                    if (n - i <= max_indel) { out[i] = 0; continue; }
                    uint8_t g = 1;
                    const int64_t b = base[i];
                    for (int size = 1; size <= max_indel && g; ++size) {
                        if (suffix[d + size - lo][i] <= b) g = 0;
                        else if (suffix[d - size - lo][i + size] <= b) g = 0;
                    }
                    out[i] = g;
                }
            }
        }
    }
}

}  // extern "C"
