// Single-threaded CPU reference for census + 8-path SGM + WTA.
//
// This reproduces the algorithmic structure of the reference engine's hot
// path (census transform + Hamming cost volume like
// matching_cost/cpp/src/census.cpp, plus the libSGM-style 8-direction
// recurrence) as an independently written -O3 C++ program.  It exists ONLY
// to measure the "CPU reference Mpix/s" baseline that BASELINE.md requires
// to be measured, not cited.
//
// Usage: cpu_baseline <rows> <cols> <ndisp> [iters]
// Prints: seconds per frame (best of iters)

#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

static inline int popcount64(uint64_t x) { return __builtin_popcountll(x); }

int main(int argc, char** argv) {
    int H = argc > 1 ? atoi(argv[1]) : 375;
    int W = argc > 2 ? atoi(argv[2]) : 450;
    int D = argc > 3 ? atoi(argv[3]) : 61;
    int iters = argc > 4 ? atoi(argv[4]) : 3;
    const int win = 5, half = 2;
    const float P1 = 8.f, P2 = 32.f;

    std::mt19937 rng(42);
    std::uniform_real_distribution<float> uni(0.f, 255.f);
    std::vector<float> left(H * W), right(H * W);
    for (auto& v : left) v = uni(rng);
    for (auto& v : right) v = uni(rng);

    std::vector<uint64_t> lsig(H * W), rsig(H * W);
    std::vector<float> cv((size_t)H * W * D);
    std::vector<float> agg((size_t)H * W * D);
    std::vector<float> lr((size_t)W * D);
    std::vector<int> disp(H * W);

    double best = 1e30;
    for (int it = 0; it < iters; ++it) {
        auto t0 = std::chrono::steady_clock::now();

        // census transform, 5x5 -> 25 bits in a uint64
        auto census = [&](const std::vector<float>& im, std::vector<uint64_t>& sig) {
            std::fill(sig.begin(), sig.end(), 0);
            for (int r = half; r < H - half; ++r)
                for (int c = half; c < W - half; ++c) {
                    uint64_t s = 0;
                    float center = im[r * W + c];
                    for (int dr = -half; dr <= half; ++dr)
                        for (int dc = -half; dc <= half; ++dc)
                            s = (s << 1) | (im[(r + dr) * W + c + dc] > center);
                    sig[r * W + c] = s;
                }
        };
        census(left, lsig);
        census(right, rsig);

        // Hamming cost volume, disparity d in [-D+1, 0]
        const float INVALID = 1e9f;
        for (int r = 0; r < H; ++r)
            for (int c = 0; c < W; ++c)
                for (int d = 0; d < D; ++d) {
                    int rc = c - d;  // disparity -d
                    float v = INVALID;
                    if (r >= half && r < H - half && c >= half && c < W - half &&
                        rc >= half && rc < W - half)
                        v = (float)popcount64(lsig[r * W + c] ^ rsig[r * W + rc]);
                    cv[((size_t)r * W + c) * D + d] = v;
                }

        // 8-direction SGM
        std::fill(agg.begin(), agg.end(), 0.f);
        const int dirs[8][2] = {{0, 1}, {0, -1}, {1, 0}, {-1, 0},
                                {1, 1}, {1, -1}, {-1, 1}, {-1, -1}};
        for (auto& dir : dirs) {
            int dr = dir[0], dc = dir[1];
            int r0 = dr >= 0 ? 0 : H - 1, r1 = dr >= 0 ? H : -1, rs = dr >= 0 ? 1 : -1;
            int c0 = dc >= 0 ? 0 : W - 1, c1 = dc >= 0 ? W : -1, cs = dc >= 0 ? 1 : -1;
            // L values of the previous row (for dr!=0) or col (dr==0)
            std::vector<float> prev_plane((size_t)W * D, 0.f), cur_plane((size_t)W * D, 0.f);
            std::vector<char> prev_valid(W, 0), cur_valid(W, 0);
            if (dr == 0) {
                // horizontal: scan cols within each row independently
                for (int r = 0; r < H; ++r) {
                    float prev_min = 0.f;
                    std::vector<float> prevL(D, 0.f);
                    bool has_prev = false;
                    for (int c = c0; c != c1; c += cs) {
                        float* C = &cv[((size_t)r * W + c) * D];
                        float* A = &agg[((size_t)r * W + c) * D];
                        float cur_min = 1e30f;
                        for (int d = 0; d < D; ++d) {
                            float v = C[d];
                            if (has_prev) {
                                float m = prevL[d];
                                if (d > 0) m = std::min(m, prevL[d - 1] + P1);
                                if (d < D - 1) m = std::min(m, prevL[d + 1] + P1);
                                m = std::min(m, prev_min + P2);
                                v += m - prev_min;
                            }
                            A[d] += v;
                            prevL[d] = v;
                            cur_min = std::min(cur_min, v);
                        }
                        prev_min = cur_min;
                        has_prev = true;
                    }
                }
            } else {
                for (int r = r0; r != r1; r += rs) {
                    std::fill(cur_valid.begin(), cur_valid.end(), 0);
                    for (int c = 0; c < W; ++c) {
                        int pc = c - dc;
                        float* C = &cv[((size_t)r * W + c) * D];
                        float* A = &agg[((size_t)r * W + c) * D];
                        bool has_prev = (r != r0) && pc >= 0 && pc < W && prev_valid[pc];
                        float prev_min = 1e30f;
                        const float* prevL = &prev_plane[(size_t)pc * D];
                        if (has_prev)
                            for (int d = 0; d < D; ++d) prev_min = std::min(prev_min, prevL[d]);
                        float* curL = &cur_plane[(size_t)c * D];
                        for (int d = 0; d < D; ++d) {
                            float v = C[d];
                            if (has_prev) {
                                float m = prevL[d];
                                if (d > 0) m = std::min(m, prevL[d - 1] + P1);
                                if (d < D - 1) m = std::min(m, prevL[d + 1] + P1);
                                m = std::min(m, prev_min + P2);
                                v += m - prev_min;
                            }
                            A[d] += v;
                            curL[d] = v;
                        }
                        cur_valid[c] = 1;
                    }
                    std::swap(prev_plane, cur_plane);
                    std::swap(prev_valid, cur_valid);
                }
            }
        }

        // WTA
        for (int r = 0; r < H; ++r)
            for (int c = 0; c < W; ++c) {
                float* A = &agg[((size_t)r * W + c) * D];
                int best_d = 0;
                float best_v = A[0];
                for (int d = 1; d < D; ++d)
                    if (A[d] < best_v) { best_v = A[d]; best_d = d; }
                disp[r * W + c] = -best_d;
            }

        auto t1 = std::chrono::steady_clock::now();
        double dt = std::chrono::duration<double>(t1 - t0).count();
        if (dt < best) best = dt;
    }

    // prevent dead-code elimination
    long sum = 0;
    for (int v : disp) sum += v;
    fprintf(stderr, "checksum %ld\n", sum);
    printf("%.6f\n", best);
    return 0;
}
