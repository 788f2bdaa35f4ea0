// Native batched DTW for host-side cache building.
//
// The TPU path (deepards_tpu/ops/dtw.py) is the hot path; this C++
// implementation serves host-only flows (offline DTW cache builds when no
// accelerator is attached) at full native speed, replacing the
// reference's dtwco C dependency (reference: deepards/dtw_lib.py:6).
//
// Build: see deepards_tpu/ops/native/build.py (g++ -O3 -shared -fPIC).
//
// DP over two rolling rows: D[i,j] = |a_i-b_j| + min(D[i-1,j], D[i,j-1],
// D[i-1,j-1]); unconstrained Euclidean DTW matching dtwco defaults.

#include <cmath>
#include <cstdint>
#include <limits>
#include <vector>

extern "C" {

// single-pair DTW
double dtw_single(const float* a, int64_t la, const float* b, int64_t lb) {
    const double INF = std::numeric_limits<double>::infinity();
    std::vector<double> prev(lb + 1, INF), cur(lb + 1, INF);
    prev[0] = 0.0;
    for (int64_t i = 1; i <= la; ++i) {
        cur[0] = INF;
        const double ai = a[i - 1];
        for (int64_t j = 1; j <= lb; ++j) {
            const double cost = std::fabs(ai - b[j - 1]);
            double best = prev[j];            // (i-1, j)
            if (cur[j - 1] < best) best = cur[j - 1];   // (i, j-1)
            if (prev[j - 1] < best) best = prev[j - 1]; // (i-1, j-1)
            cur[j] = cost + best;
        }
        std::swap(prev, cur);
    }
    return prev[lb];
}

// batch of pairs packed into padded (batch, n) row-major buffers
void dtw_batch(const float* a, const float* b, const int32_t* la,
               const int32_t* lb, int64_t batch, int64_t n, double* out) {
    for (int64_t k = 0; k < batch; ++k) {
        out[k] = dtw_single(a + k * n, la[k], b + k * n, lb[k]);
    }
}

}  // extern "C"
