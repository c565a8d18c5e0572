// nextgp_tpu native runtime kernels (host side).
//
// The reference (`datasciencetoolkit/NextGP.jl`) does all of this in Julia:
// genotype CSV ingestion via CSV.read (/root/reference/src/prepMatVec.jl:116),
// pedigree inbreeding + A-inverse via PedigreeBase (misc.jl:98-115). Those
// host stages dominate wall time at production scale (600k-SNP panels are
// tens of GB of text), so this build implements them as multithreaded C++
// exposed over a plain C ABI (loaded with ctypes; no pybind11 dependency).
//
// Exposed entry points:
//   ng_version            -> ABI version tag
//   ng_geno_dims          -> (n_rows, n_cols) of a delimited genotype file
//   ng_geno_parse         -> parallel parse to int8 dosages + column stats
//   ng_bed_read           -> PLINK .bed (SNP-major) -> int8 (n, p) dosages
//   ng_inbreeding_ml      -> Meuwissen & Luo (1992) inbreeding coefficients
//   ng_ainverse_triplets  -> Henderson's-rules A-inverse COO triplets
//   ng_write_tsv_block    -> buffered float block -> TSV append (spooler)
//
// All matrices are row-major. Missing genotypes are coded -1.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#if defined(__unix__) || defined(__APPLE__)
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#endif

extern "C" {

int32_t ng_version() { return 2; }

namespace {

struct MappedFile {
  const char* data = nullptr;
  size_t size = 0;
  int fd = -1;
  bool ok() const { return data != nullptr; }
};

MappedFile map_file(const char* path) {
  MappedFile m;
  m.fd = open(path, O_RDONLY);
  if (m.fd < 0) return m;
  struct stat st;
  if (fstat(m.fd, &st) != 0 || st.st_size == 0) {
    close(m.fd);
    m.fd = -1;
    return m;
  }
  void* p = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, m.fd, 0);
  if (p == MAP_FAILED) {
    close(m.fd);
    m.fd = -1;
    return m;
  }
  m.data = static_cast<const char*>(p);
  m.size = st.st_size;
  return m;
}

void unmap_file(MappedFile& m) {
  if (m.data) munmap(const_cast<char*>(m.data), m.size);
  if (m.fd >= 0) close(m.fd);
  m.data = nullptr;
  m.fd = -1;
}

inline bool is_delim(char c, char delim) {
  return c == delim || c == ' ' || c == '\t' || c == ',';
}

int n_threads_for(int64_t work_items) {
  unsigned hw = std::thread::hardware_concurrency();
  if (hw == 0) hw = 4;
  int64_t t = static_cast<int64_t>(hw);
  if (work_items < t) t = work_items > 0 ? work_items : 1;
  return static_cast<int>(t);
}

// Parse one token starting at s (s < end). Returns the dosage, -1 for the
// missing markers NA/na/./NaN/nan, or -2 for any other token (fractional
// dosages like "1.5", garbage) so the caller can fail loudly instead of
// silently treating it as missing — matching the pure-Python path, which
// raises and points real-valued data at from_float_array.
inline int8_t parse_token(const char* s, const char* end, const char** pos) {
  const char* q = s;
  while (q < end && !is_delim(*q, ' ') && *q != '\n' && *q != '\r') ++q;
  *pos = q;
  size_t len = static_cast<size_t>(q - s);
  if (len == 0) return -1;
  auto low = [](char c) { return static_cast<char>(c | 0x20); };
  if ((len == 2 && low(s[0]) == 'n' && low(s[1]) == 'a') ||
      (len == 1 && s[0] == '.') ||
      (len == 3 && low(s[0]) == 'n' && low(s[1]) == 'a' && low(s[2]) == 'n'))
    return -1;
  // fast integer path
  bool neg = (*s == '-');
  const char* r = s + (neg ? 1 : 0);
  if (r >= q) return -2;
  long v = 0;
  for (const char* c = r; c < q; ++c) {
    if (*c >= '0' && *c <= '9') {
      v = v * 10 + (*c - '0');
      if (v > 127) return -2;  // int8 wraparound would corrupt dosages
    } else if (*c == '.') {
      // accept trailing ".0" / ".00" only; other fractions are invalid
      for (const char* z = c + 1; z < q; ++z)
        if (*z != '0') return -2;
      break;
    } else {
      return -2;
    }
  }
  if (neg && v != 1) return -2;  // only "-1" (missing) may be negative
  return static_cast<int8_t>(neg ? -v : v);
}

}  // namespace

// First pass: dimensions of a whitespace/comma-delimited numeric table.
// Returns 0 on success.
int32_t ng_geno_dims(const char* path, int64_t* n_rows, int64_t* n_cols) {
  MappedFile m = map_file(path);
  if (!m.ok()) return 1;
  const char* p = m.data;
  const char* end = m.data + m.size;
  // columns: tokens on the first non-empty line (skip leading blanks)
  int64_t cols = 0;
  while (p < end && (*p == '\n' || *p == '\r')) ++p;
  const char* line_end = p;
  while (line_end < end && *line_end != '\n') ++line_end;
  {
    const char* c = p;
    bool in_tok = false;
    for (; c < line_end; ++c) {
      bool d = is_delim(*c, ' ') || *c == '\r';
      if (!d && !in_tok) {
        ++cols;
        in_tok = true;
      } else if (d) {
        in_tok = false;
      }
    }
  }
  // rows: non-empty lines (parallel newline count, then correct for blanks)
  int nt = n_threads_for(static_cast<int64_t>(m.size / (1 << 20)) + 1);
  std::vector<int64_t> counts(nt, 0);
  std::vector<std::thread> th;
  size_t chunk = m.size / nt + 1;
  for (int t = 0; t < nt; ++t) {
    th.emplace_back([&, t]() {
      const char* a = m.data + t * chunk;
      const char* b = m.data + std::min(m.size, (t + 1) * chunk);
      int64_t c = 0;
      bool saw = false;
      // count lines containing at least one non-space char; a line belongs
      // to the chunk holding its terminating newline (or EOF).
      for (const char* q = a; q < b; ++q) {
        char ch = *q;
        if (ch == '\n') {
          // whether this line was non-empty is tracked from line start; for
          // chunk-boundary lines scan back to the previous newline.
          const char* ls = q;
          while (ls > m.data && ls[-1] != '\n') --ls;
          for (const char* z = ls; z < q; ++z)
            if (!is_delim(*z, ' ') && *z != '\r') {
              ++c;
              break;
            }
          (void)saw;
        }
      }
      counts[t] = c;
    });
  }
  for (auto& x : th) x.join();
  int64_t rows = 0;
  for (auto c : counts) rows += c;
  // trailing line without newline
  if (m.size > 0 && m.data[m.size - 1] != '\n') {
    const char* ls = end;
    while (ls > m.data && ls[-1] != '\n') --ls;
    for (const char* z = ls; z < end; ++z)
      if (!is_delim(*z, ' ') && *z != '\r') {
        ++rows;
        break;
      }
  }
  unmap_file(m);
  *n_rows = rows;
  *n_cols = cols;
  return 0;
}

// Second pass: parse into caller-allocated out[n*p] (int8, row-major).
// col_sum[p] accumulates non-missing dosage sums, col_n[p] non-missing
// counts (both caller-zeroed). Rows are assigned to threads by line index.
// Returns 0 on success, 2 on ragged rows.
int32_t ng_geno_parse(const char* path, int64_t n, int64_t p, int8_t* out,
                      double* col_sum, int64_t* col_n) {
  MappedFile m = map_file(path);
  if (!m.ok()) return 1;
  // index line starts
  std::vector<const char*> lines;
  lines.reserve(static_cast<size_t>(n));
  const char* end = m.data + m.size;
  const char* q = m.data;
  while (q < end && static_cast<int64_t>(lines.size()) < n) {
    const char* ls = q;
    const char* le = ls;
    while (le < end && *le != '\n') ++le;
    for (const char* z = ls; z < le; ++z)
      if (!is_delim(*z, ' ') && *z != '\r') {
        lines.push_back(ls);
        break;
      }
    q = le < end ? le + 1 : end;
  }
  if (static_cast<int64_t>(lines.size()) != n) {
    unmap_file(m);
    return 2;
  }
  int nt = n_threads_for(n);
  std::atomic<int32_t> err{0};
  std::vector<std::vector<double>> sums(nt, std::vector<double>(p, 0.0));
  std::vector<std::vector<int64_t>> cnts(nt, std::vector<int64_t>(p, 0));
  std::vector<std::thread> th;
  int64_t rows_per = (n + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    th.emplace_back([&, t]() {
      double* sm = sums[t].data();
      int64_t* cn = cnts[t].data();
      int64_t lo = t * rows_per, hi = std::min<int64_t>(n, lo + rows_per);
      for (int64_t i = lo; i < hi; ++i) {
        const char* c = lines[i];
        int8_t* row = out + i * p;
        int64_t j = 0;
        while (c < end && *c != '\n' && j < p) {
          if (is_delim(*c, ' ') || *c == '\r') {
            ++c;
            continue;
          }
          const char* nxt;
          int8_t v = parse_token(c, end, &nxt);
          if (v == -2) {
            err.store(3);  // invalid/non-integral token
            return;
          }
          row[j] = v;
          if (v >= 0) {
            sm[j] += v;
            ++cn[j];
          }
          ++j;
          c = nxt;
        }
        if (j != p) {
          err.store(2);
          return;
        }
        // extra tokens beyond p are ragged rows, not silent truncation
        while (c < end && *c != '\n') {
          if (!is_delim(*c, ' ') && *c != '\r') {
            err.store(2);
            return;
          }
          ++c;
        }
      }
    });
  }
  for (auto& x : th) x.join();
  unmap_file(m);
  if (err.load()) return err.load();
  for (int t = 0; t < nt; ++t)
    for (int64_t j = 0; j < p; ++j) {
      col_sum[j] += sums[t][j];
      col_n[j] += cnts[t][j];
    }
  return 0;
}

// PLINK .bed decode (SNP-major v1.0; magic 6c 1b 01). Output int8 (n, p)
// row-major dosages counting A1 alleles: 00->2, 10->1, 11->0, 01->-1.
// col_sum/col_n as in ng_geno_parse. Returns 0 ok, 1 io, 3 bad magic.
int32_t ng_bed_read(const char* path, int64_t n, int64_t p, int8_t* out,
                    double* col_sum, int64_t* col_n) {
  MappedFile m = map_file(path);
  if (!m.ok()) return 1;
  const unsigned char* d = reinterpret_cast<const unsigned char*>(m.data);
  if (m.size < 3 || d[0] != 0x6c || d[1] != 0x1b || d[2] != 0x01) {
    unmap_file(m);
    return 3;
  }
  int64_t bytes_per_snp = (n + 3) / 4;
  if (static_cast<int64_t>(m.size) < 3 + bytes_per_snp * p) {
    unmap_file(m);
    return 1;
  }
  static const int8_t LUT[4] = {2, -1, 1, 0};
  int nt = n_threads_for(p);
  std::vector<std::thread> th;
  int64_t per = (p + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    th.emplace_back([&, t]() {
      int64_t lo = t * per, hi = std::min<int64_t>(p, lo + per);
      for (int64_t j = lo; j < hi; ++j) {
        const unsigned char* s = d + 3 + j * bytes_per_snp;
        double sum = 0.0;
        int64_t cnt = 0;
        for (int64_t i = 0; i < n; ++i) {
          int8_t v = LUT[(s[i >> 2] >> ((i & 3) << 1)) & 3];
          out[i * p + j] = v;
          if (v >= 0) {
            sum += v;
            ++cnt;
          }
        }
        col_sum[j] = sum;
        col_n[j] = cnt;
      }
    });
  }
  for (auto& x : th) x.join();
  unmap_file(m);
  return 0;
}

// Meuwissen & Luo (1992) inbreeding. sire/dam are 0-based indices into the
// (topologically ordered) pedigree, -1 = unknown. f must hold n doubles.
// Semantics identical to nextgp_tpu/data/pedigree.py:inbreeding_meuwissen_luo
// (PedigreeBase.get_inb equivalent, /root/reference/src/misc.jl:108).
int32_t ng_inbreeding_ml(const int64_t* sire, const int64_t* dam, int64_t n,
                         double* f_out) {
  std::vector<double> f(n + 1, 0.0);
  std::vector<int64_t> s(n + 1, 0), d(n + 1, 0), point(n + 1, 0);
  std::vector<double> L(n + 1, 0.0), D(n + 1, 0.0);
  for (int64_t i = 1; i <= n; ++i) {
    s[i] = sire[i - 1] + 1;
    d[i] = dam[i - 1] + 1;
  }
  for (int64_t i = 1; i <= n; ++i) {
    int64_t si = s[i], di = d[i];
    double fs = si > 0 ? f[si] : -1.0;
    double fd = di > 0 ? f[di] : -1.0;
    D[i] = 0.5 - 0.25 * (fs + fd);
    if (si == 0 || di == 0) {
      f[i] = 0.0;
      continue;
    }
    double fi = -1.0;
    L[i] = 1.0;
    int64_t j = i;
    while (j != 0) {
      int64_t k = j;
      double r = 0.5 * L[k];
      int64_t ks = std::max(s[k], d[k]);
      int64_t kd = std::min(s[k], d[k]);
      if (ks > 0) {
        while (point[k] > ks) k = point[k];
        L[ks] += r;
        if (ks != point[k]) {
          point[ks] = point[k];
          point[k] = ks;
        }
        if (kd > 0) {
          while (point[k] > kd) k = point[k];
          L[kd] += r;
          if (kd != point[k]) {
            point[kd] = point[k];
            point[k] = kd;
          }
        }
      }
      fi += L[j] * L[j] * D[j];
      L[j] = 0.0;
      k = j;
      j = point[j];
      point[k] = 0;
    }
    f[i] = fi;
  }
  std::memcpy(f_out, f.data() + 1, n * sizeof(double));
  return 0;
}

// Henderson's-rules A-inverse as COO triplets, using precomputed inbreeding.
// Caller provides arrays of capacity 9*n. Returns the number of triplets
// written (entries are NOT deduplicated; sum duplicates on assembly).
// Semantics of nextgp_tpu/data/pedigree.py:a_inverse (misc.jl:110).
int64_t ng_ainverse_triplets(const int64_t* sire, const int64_t* dam,
                             const double* f, int64_t n, int64_t* ri,
                             int64_t* ci, double* v) {
  int64_t k = 0;
  auto put = [&](int64_t r, int64_t c, double x) {
    ri[k] = r;
    ci[k] = c;
    v[k] = x;
    ++k;
  };
  for (int64_t i = 0; i < n; ++i) {
    int64_t si = sire[i], di = dam[i];
    double fs = si >= 0 ? f[si] : 0.0;
    double fd = di >= 0 ? f[di] : 0.0;
    double dii = 1.0 - (si >= 0 ? 0.25 * (1.0 + fs) : 0.0) -
                 (di >= 0 ? 0.25 * (1.0 + fd) : 0.0);
    double a = 1.0 / dii;
    put(i, i, a);
    for (int64_t pz : {si, di}) {
      if (pz >= 0) {
        put(i, pz, -a / 2.0);
        put(pz, i, -a / 2.0);
        put(pz, pz, a / 4.0);
      }
    }
    if (si >= 0 && di >= 0) {
      put(si, di, a / 4.0);
      put(di, si, a / 4.0);
    }
  }
  return k;
}

// Append a float64 block (rows x cols) to a TSV file with %g formatting.
// The async posterior spooler's write path (replaces the reference's
// per-iteration synchronous writedlm, /root/reference/src/outFiles.jl:17-21).
int32_t ng_write_tsv_block(const char* path, const double* data, int64_t rows,
                           int64_t cols) {
  FILE* fh = fopen(path, "ab");
  if (!fh) return 1;
  std::vector<char> buf;
  buf.reserve(static_cast<size_t>(cols) * 24 + 2);
  char tmp[32];
  for (int64_t i = 0; i < rows; ++i) {
    buf.clear();
    const double* r = data + i * cols;
    for (int64_t j = 0; j < cols; ++j) {
      int len = snprintf(tmp, sizeof(tmp), "%.17g", r[j]);
      if (j) buf.push_back('\t');
      buf.insert(buf.end(), tmp, tmp + len);
    }
    buf.push_back('\n');
    if (fwrite(buf.data(), 1, buf.size(), fh) != buf.size()) {
      fclose(fh);
      return 2;  // partial write (e.g. ENOSPC) must surface, not truncate
    }
  }
  if (fclose(fh) != 0) return 2;
  return 0;
}

}  // extern "C"
