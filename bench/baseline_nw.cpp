// CPU baseline for the framework benchmark: the reference's evaluatePath hot
// loop (single-threaded NW path alignment + traceback score, fw + rc per
// read; semantics of vgl-hub/gfalign src/alignments.cpp:499-554 and
// src/eval.cpp:79-98), reimplemented standalone.  The reference is
// single-threaded in its search loop, so this is the apples-to-apples
// per-chip comparison point.
//
// Usage: baseline_nw <C> <R> <N> <M> [iters]
// Prints: records_per_s=<float>
#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

static const int MAXL = 1025;
static int dp[MAXL][MAXL];

// xorshift for reproducible workloads without <random> overhead
static uint64_t rng_state = 0x9E3779B97F4A7C15ull;
static inline uint64_t rnd() {
  uint64_t x = rng_state;
  x ^= x << 13; x ^= x >> 7; x ^= x << 17;
  rng_state = x;
  return x;
}

static int nw_traceback_score(const int* A, int n, const int* B, int m) {
  for (int j = 0; j <= n; j++) dp[0][j] = -j;  // row-0 extent quirk kept
  for (int i = 1; i <= n; i++) {
    for (int j = 1; j <= m; j++) {
      int s = (A[i - 1] == B[j - 1]) ? 0 : -1;
      int best = dp[i - 1][j - 1] + s;
      int up = dp[i - 1][j] + (j < m ? -1 : 0);
      int left = dp[i][j - 1] - 1;
      if (up > best) best = up;
      if (left > best) best = left;
      dp[i][j] = best;
    }
  }
  int ii = n, jj = m, score = 0, sblen = 0;
  while (ii != 0 || jj != 0) {
    if (ii == 0) {
      jj--;
    } else if (jj == 0) {
      ii--;
    } else {
      int s = (A[ii - 1] == B[jj - 1]) ? 0 : -1;
      if (dp[ii][jj] == dp[ii - 1][jj - 1] + s) {
        score += s; sblen++; ii--; jj--;
      } else if (dp[ii - 1][jj] >= dp[ii][jj - 1]) {
        ii--; if (sblen > 0) score -= 1;
      } else {
        jj--; score -= 1; sblen++;
      }
    }
  }
  return score;
}

int main(int argc, char** argv) {
  int C = argc > 1 ? atoi(argv[1]) : 8;
  int R = argc > 2 ? atoi(argv[2]) : 512;
  int N = argc > 3 ? atoi(argv[3]) : 64;
  int M = argc > 4 ? atoi(argv[4]) : 64;
  int iters = argc > 5 ? atoi(argv[5]) : 1;

  std::vector<std::vector<int>> cands(C), reads(R), reads_rc(R);
  for (auto& c : cands) {
    c.resize(N);
    for (int& v : c) v = (int)(rnd() % 8) * 4 + (int)(rnd() % 2);
  }
  for (int r = 0; r < R; r++) {
    reads[r].resize(M);
    for (int& v : reads[r]) v = (int)(rnd() % 8) * 4 + (int)(rnd() % 2);
    reads_rc[r].resize(M);
    for (int j = 0; j < M; j++) {
      int key = reads[r][M - 1 - j];
      int code = key % 4;
      reads_rc[r][j] = (key / 4) * 4 + (code == 0 ? 1 : 0);
    }
  }

  volatile long long sink = 0;
  auto t0 = std::chrono::steady_clock::now();
  for (int it = 0; it < iters; it++) {
    for (int c = 0; c < C; c++) {
      for (int r = 0; r < R; r++) {
        int fw = nw_traceback_score(cands[c].data(), N, reads[r].data(), M);
        int rc = nw_traceback_score(cands[c].data(), N, reads_rc[r].data(), M);
        sink += std::max(fw, rc);
      }
    }
  }
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  double records = (double)C * R * iters;
  printf("records_per_s=%.2f\n", records / secs);
  return (int)(sink & 1) * 0;  // keep sink live
}
