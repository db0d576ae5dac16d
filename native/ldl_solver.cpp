// Sparse LDL^T direct solver for the pose-graph normal equations.
//
// This is the framework's native solver tier — the role SuiteSparse/UMFPACK
// plays in the reference (pose_graph_optimization.rs:124-144, a C library
// behind an FFI). Input is the same COO triplet stream the JAX assembly
// produces (duplicates summed, matching repeated put() semantics,
// rs:194-212); internally: reverse Cuthill-McKee ordering for fill
// reduction, elimination-tree symbolic analysis, up-looking LDL^T numeric
// factorization, and forward/backward triangular solves.
//
// Build: g++ -O3 -march=native -shared -fPIC ldl_solver.cpp -o libldl.so
// ABI (ctypes):
//   int ldl_solve_coo(int64 n, int64 nnz,
//                     const int32* rows, const int32* cols,
//                     const double* vals, const double* b, double* x);
// returns 0 on success, <0 on error (-1 alloc, -2 not SPD-ish/zero pivot).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

using std::vector;

// ---------------------------------------------------------------- RCM
// Reverse Cuthill-McKee ordering on the symmetric pattern.
static void rcm_order(int64_t n, const vector<int64_t>& adj_ptr,
                      const vector<int32_t>& adj, vector<int32_t>& perm) {
  vector<int32_t> degree(n);
  for (int64_t i = 0; i < n; ++i) degree[i] = int32_t(adj_ptr[i + 1] - adj_ptr[i]);
  vector<char> visited(n, 0);
  perm.clear();
  perm.reserve(n);
  vector<int32_t> queue;
  queue.reserve(n);
  for (int64_t seed_scan = 0; seed_scan < n; ++seed_scan) {
    if (visited[seed_scan]) continue;
    // pick the unvisited node of minimum degree in this component
    int32_t seed = int32_t(seed_scan);
    // BFS to find component + a low-degree start
    size_t comp_begin = perm.size();
    queue.clear();
    queue.push_back(seed);
    visited[seed] = 1;
    for (size_t qh = 0; qh < queue.size(); ++qh) {
      int32_t u = queue[qh];
      perm.push_back(u);
      // neighbors sorted by degree for CM ordering
      int64_t lo = adj_ptr[u], hi = adj_ptr[u + 1];
      size_t first_new = queue.size();
      for (int64_t p = lo; p < hi; ++p) {
        int32_t v = adj[p];
        if (!visited[v]) {
          visited[v] = 1;
          queue.push_back(v);
        }
      }
      std::sort(queue.begin() + first_new, queue.end(),
                [&](int32_t a, int32_t b) { return degree[a] < degree[b]; });
    }
    (void)comp_begin;
  }
  std::reverse(perm.begin(), perm.end());
}

struct CSCUpper {
  int64_t n = 0;
  vector<int64_t> p;   // column pointers, size n+1
  vector<int32_t> i;   // row indices (sorted, deduped)
  vector<double> x;    // values
};

// COO (general, both triangles, duplicates) -> CSC of the upper triangle
// of P A P^T with duplicates summed.
static int build_upper_csc(int64_t n, int64_t nnz, const int32_t* rows,
                           const int32_t* cols, const double* vals,
                           const vector<int32_t>& perm_inv, CSCUpper& out) {
  out.n = n;
  out.p.assign(n + 1, 0);
  // count upper entries per column (before dedup)
  vector<int64_t> count(n, 0);
  for (int64_t k = 0; k < nnz; ++k) {
    int32_t r = perm_inv[rows[k]];
    int32_t c = perm_inv[cols[k]];
    if (r <= c) count[c]++;
  }
  vector<int64_t> start(n + 1, 0);
  for (int64_t j = 0; j < n; ++j) start[j + 1] = start[j] + count[j];
  vector<int32_t> ti(start[n]);
  vector<double> tx(start[n]);
  vector<int64_t> fill = start;
  for (int64_t k = 0; k < nnz; ++k) {
    int32_t r = perm_inv[rows[k]];
    int32_t c = perm_inv[cols[k]];
    if (r <= c) {
      int64_t q = fill[c]++;
      ti[q] = r;
      tx[q] = vals[k];
    }
  }
  // per-column sort + dedup-sum
  out.p.assign(n + 1, 0);
  vector<int64_t> order;
  out.i.reserve(ti.size());
  out.x.reserve(tx.size());
  for (int64_t j = 0; j < n; ++j) {
    int64_t lo = start[j], hi = start[j + 1];
    order.resize(hi - lo);
    for (int64_t k = 0; k < hi - lo; ++k) order[k] = lo + k;
    std::sort(order.begin(), order.end(),
              [&](int64_t a, int64_t b) { return ti[a] < ti[b]; });
    int32_t last = -1;
    for (int64_t k : order) {
      if (ti[k] == last) {
        out.x.back() += tx[k];
      } else {
        out.i.push_back(ti[k]);
        out.x.push_back(tx[k]);
        last = ti[k];
      }
    }
    out.p[j + 1] = int64_t(out.i.size());
  }
  return 0;
}

}  // namespace

extern "C" {

int ldl_solve_coo(int64_t n, int64_t nnz, const int32_t* rows,
                  const int32_t* cols, const double* vals, const double* b,
                  double* x_out) {
  if (n <= 0 || nnz < 0) return -1;

  // symmetric adjacency (off-diagonal pattern, with duplicates ok for RCM)
  vector<int64_t> adj_ptr(n + 1, 0);
  {
    vector<int64_t> deg(n, 0);
    for (int64_t k = 0; k < nnz; ++k)
      if (rows[k] != cols[k]) {
        deg[rows[k]]++;
        deg[cols[k]]++;
      }
    for (int64_t i = 0; i < n; ++i) adj_ptr[i + 1] = adj_ptr[i] + deg[i];
  }
  vector<int32_t> adj(adj_ptr[n]);
  {
    vector<int64_t> fill(adj_ptr.begin(), adj_ptr.end() - 1);
    for (int64_t k = 0; k < nnz; ++k)
      if (rows[k] != cols[k]) {
        adj[fill[rows[k]]++] = cols[k];
        adj[fill[cols[k]]++] = rows[k];
      }
  }
  vector<int32_t> perm;
  rcm_order(n, adj_ptr, adj, perm);
  vector<int32_t> perm_inv(n);
  for (int64_t i = 0; i < n; ++i) perm_inv[perm[i]] = int32_t(i);

  CSCUpper A;
  if (build_upper_csc(n, nnz, rows, cols, vals, perm_inv, A) != 0) return -1;

  // ---- symbolic: elimination tree + column counts (up-looking LDL)
  vector<int32_t> parent(n, -1), flag(n, -1);
  vector<int64_t> lnz(n, 0);
  for (int64_t k = 0; k < n; ++k) {
    flag[k] = int32_t(k);
    for (int64_t p = A.p[k]; p < A.p[k + 1]; ++p) {
      int32_t i = A.i[p];
      if (i >= k) continue;
      for (; flag[i] != k; i = parent[i]) {
        if (parent[i] == -1) parent[i] = int32_t(k);
        lnz[i]++;
        flag[i] = int32_t(k);
      }
    }
  }
  vector<int64_t> Lp(n + 1, 0);
  for (int64_t k = 0; k < n; ++k) Lp[k + 1] = Lp[k] + lnz[k];
  vector<int32_t> Li(Lp[n]);
  vector<double> Lx(Lp[n]);
  vector<double> D(n), Y(n, 0.0);
  vector<int64_t> lfill(n);
  vector<int32_t> pattern(n);

  // ---- numeric factorization
  std::fill(flag.begin(), flag.end(), -1);
  for (int64_t k = 0; k < n; ++k) lfill[k] = Lp[k];
  for (int64_t k = 0; k < n; ++k) {
    int64_t top = n;
    flag[k] = int32_t(k);
    D[k] = 0.0;
    for (int64_t p = A.p[k]; p < A.p[k + 1]; ++p) {
      int32_t i = A.i[p];
      if (i > k) continue;
      Y[i] += A.x[p];
      int64_t len = 0;
      for (; flag[i] != k; i = parent[i]) {
        pattern[len++] = i;
        flag[i] = int32_t(k);
      }
      while (len > 0) pattern[--top] = pattern[--len];
    }
    D[k] = Y[k];
    Y[k] = 0.0;
    for (int64_t s = top; s < n; ++s) {
      int32_t i = pattern[s];
      double yi = Y[i];
      Y[i] = 0.0;
      double l_ki = yi / D[i];
      for (int64_t p = Lp[i]; p < lfill[i]; ++p) Y[Li[p]] -= Lx[p] * yi;
      Li[lfill[i]] = int32_t(k);
      Lx[lfill[i]] = l_ki;
      lfill[i]++;
      D[k] -= l_ki * yi;
    }
    if (D[k] == 0.0) return -2;
  }

  // ---- solve P A P^T (P x) = (P b):  L z = Pb; w = z ./ D; L^T y = w
  vector<double> z(n);
  for (int64_t i = 0; i < n; ++i) z[i] = b[perm[i]];
  for (int64_t j = 0; j < n; ++j) {
    double zj = z[j];
    for (int64_t p = Lp[j]; p < Lp[j + 1]; ++p) z[Li[p]] -= Lx[p] * zj;
  }
  for (int64_t j = 0; j < n; ++j) z[j] /= D[j];
  for (int64_t j = n - 1; j >= 0; --j) {
    double zj = z[j];
    for (int64_t p = Lp[j]; p < Lp[j + 1]; ++p) zj -= Lx[p] * z[Li[p]];
    z[j] = zj;
  }
  for (int64_t i = 0; i < n; ++i) x_out[perm[i]] = z[i];
  return 0;
}

}  // extern "C"
