// isph_tpu native host runtime.
//
// The reference's runtime around the solver is LAMMPS C++ (neighbor bins,
// domain decomposition, dump IO).  The TPU build keeps the device compute in
// JAX/XLA and provides the host-side runtime pieces natively here:
//   - cell-list neighbor builder (host-side golden path + setup-time lists;
//     mirrors the device builder in isph_tpu/ops/neighbors.py)
//   - fast LAMMPS-format dump frame writer (replaces np.savetxt formatting)
//
// Exposed with a C ABI and loaded via ctypes (isph_tpu/native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// Build a fixed-width padded neighbor list with minimum-image periodicity.
//
// x:        n*dim, row-major (particle-major: x[i*dim + d])
// valid:    n bytes (0/1)
// lo/hi:    dim
// periodic: dim bytes
// idx:      out, n*kmax row-major (idx[i*kmax + k]); padded slots = i
// mask:     out, n*kmax bytes
// count:    out, n
// returns:  max neighbor count observed (caller checks > kmax for overflow)
int isph_build_neighbors(const double* x, const uint8_t* valid, int64_t n,
                         int dim, const double* lo, const double* hi,
                         const uint8_t* periodic, double cutoff, int kmax,
                         int32_t* idx, uint8_t* mask, int32_t* count) {
  const double cutsq = cutoff * cutoff;
  double len[3], csize[3];
  int ncell[3] = {1, 1, 1};
  for (int d = 0; d < dim; ++d) {
    len[d] = hi[d] - lo[d];
    ncell[d] = std::max(1, (int)std::floor(len[d] / cutoff));
    csize[d] = len[d] / ncell[d];
  }
  const int64_t ncells =
      (int64_t)ncell[0] * (dim > 1 ? ncell[1] : 1) * (dim > 2 ? ncell[2] : 1);

  auto wrap = [&](double v, int d) {
    if (!periodic[d]) return v;
    double w = std::fmod(v - lo[d], len[d]);
    if (w < 0) w += len[d];
    return lo[d] + w;
  };
  auto cell_of = [&](const double* xi, int* c) {
    for (int d = 0; d < dim; ++d) {
      int cd = (int)std::floor((wrap(xi[d], d) - lo[d]) / csize[d]);
      c[d] = std::min(std::max(cd, 0), ncell[d] - 1);
    }
  };
  auto flat = [&](const int* c) {
    int64_t f = c[0];
    for (int d = 1; d < dim; ++d) f = f * ncell[d] + c[d];
    return f;
  };

  // bucket particles into cells (counting sort)
  std::vector<int64_t> cell_id(n);
  std::vector<int32_t> head(ncells + 1, 0);
  for (int64_t i = 0; i < n; ++i) {
    if (!valid[i]) {
      cell_id[i] = -1;
      continue;
    }
    int c[3];
    cell_of(&x[i * dim], c);
    cell_id[i] = flat(c);
    ++head[cell_id[i] + 1];
  }
  for (int64_t c = 0; c < ncells; ++c) head[c + 1] += head[c];
  std::vector<int32_t> order(n);
  {
    std::vector<int32_t> cursor(head.begin(), head.end() - 1);
    for (int64_t i = 0; i < n; ++i)
      if (cell_id[i] >= 0) order[cursor[cell_id[i]]++] = (int32_t)i;
  }

  int maxcnt = 0;
  std::vector<int32_t> cand;
  for (int64_t i = 0; i < n; ++i) {
    int32_t* row = &idx[i * kmax];
    uint8_t* mrow = &mask[i * kmax];
    for (int k = 0; k < kmax; ++k) {
      row[k] = (int32_t)i;
      mrow[k] = 0;
    }
    count[i] = 0;
    if (!valid[i]) continue;

    int ci[3];
    cell_of(&x[i * dim], ci);
    int cnt = 0;
    int off[3] = {0, 0, 0};
    // iterate 3^dim neighbor cells
    const int span = (dim == 1) ? 3 : (dim == 2 ? 9 : 27);
    for (int s = 0; s < span; ++s) {
      int rem = s;
      bool ok = true;
      int cc[3];
      for (int d = dim - 1; d >= 0; --d) {
        int o = rem % 3 - 1;
        rem /= 3;
        int v = ci[d] + o;
        if (periodic[d]) {
          v = (v % ncell[d] + ncell[d]) % ncell[d];
        } else if (v < 0 || v >= ncell[d]) {
          ok = false;
          break;
        }
        cc[d] = v;
      }
      if (!ok) continue;
      const int64_t fc = flat(cc);
      for (int32_t p = head[fc]; p < head[fc + 1]; ++p) {
        const int32_t j = order[p];
        if (j == (int32_t)i) continue;
        double rsq = 0.0;
        for (int d = 0; d < dim; ++d) {
          double r = wrap(x[i * dim + d], d) - wrap(x[j * dim + d], d);
          if (periodic[d]) {
            r -= len[d] * std::round(r / len[d]);
          }
          rsq += r * r;
        }
        if (rsq < cutsq) {
          if (cnt < kmax) {
            row[cnt] = j;
            mrow[cnt] = 1;
          }
          ++cnt;
        }
      }
    }
    count[i] = cnt;
    maxcnt = std::max(maxcnt, cnt);
  }
  return maxcnt;
}

// Write one LAMMPS dump frame.  cols: ncols arrays of length n (column-major
// table), names: space-separated column names.
int isph_write_dump_frame(const char* path, int append, int64_t timestep,
                          int64_t n, int ncols, const double* const* cols,
                          const char* names, const double* boxlo,
                          const double* boxhi, const uint8_t* periodic,
                          int dim) {
  FILE* f = std::fopen(path, append ? "a" : "w");
  if (!f) return -1;
  std::fprintf(f, "ITEM: TIMESTEP\n%lld\n", (long long)timestep);
  std::fprintf(f, "ITEM: NUMBER OF ATOMS\n%lld\n", (long long)n);
  std::fprintf(f, "ITEM: BOX BOUNDS %s %s %s\n", periodic[0] ? "pp" : "ff",
               (dim > 1 && periodic[1]) ? "pp" : "ff",
               (dim > 2 && periodic[2]) ? "pp" : "ff");
  for (int d = 0; d < 3; ++d) {
    if (d < dim)
      std::fprintf(f, "%.16e %.16e\n", boxlo[d], boxhi[d]);
    else
      std::fprintf(f, "-0.5 0.5\n");
  }
  std::fprintf(f, "ITEM: ATOMS %s\n", names);
  std::vector<char> buf(ncols * 32 + 2);
  for (int64_t i = 0; i < n; ++i) {
    char* p = buf.data();
    for (int c = 0; c < ncols; ++c)
      p += std::snprintf(p, 32, c ? " %.10g" : "%.10g", cols[c][i]);
    *p++ = '\n';
    std::fwrite(buf.data(), 1, p - buf.data(), f);
  }
  std::fclose(f);
  return 0;
}

}  // extern "C"
