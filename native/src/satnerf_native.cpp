// satnerf_tpu native host kernels (C ABI, loaded via ctypes).
//
// TPU-native re-implementation of the reference's only compiled code paths:
//  * nan-aware multiscale NCC DSM registration (the reference uses Numba JIT,
//    ref: eval/utils/dsmr.py:6-162) — exhaustive +-irange shift search per
//    pyramid level;
//  * point-cloud -> DSM grid rasterization with radius splatting (the
//    reference calls the third-party C library plyflatten,
//    ref: eval/utils/dsm.py:76).
//
// All kernels operate on contiguous double buffers; the Python wrappers in
// satnerf_tpu/ops own allocation and the pyramid recursion.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>

extern "C" {

// nan-aware 2x downsample of a (h, w) image into ceil(h/2) x ceil(w/2).
void sn_downsample2x(const double* in, int64_t h, int64_t w, double* out) {
  const int64_t oh = (h + 1) / 2, ow = (w + 1) / 2;
  for (int64_t j = 0; j < oh; ++j) {
    for (int64_t i = 0; i < ow; ++i) {
      double acc = 0.0;
      int cnt = 0;
      for (int dj = 0; dj < 2; ++dj) {
        for (int di = 0; di < 2; ++di) {
          const int64_t y = 2 * j + dj, x = 2 * i + di;
          if (y < h && x < w) {
            const double v = in[y * w + x];
            if (std::isfinite(v)) {
              acc += v;
              ++cnt;
            }
          }
        }
      }
      out[j * ow + i] =
          cnt > 0 ? acc / cnt : std::numeric_limits<double>::quiet_NaN();
    }
  }
}

// mean/std/xcorr of u vs v shifted by (dx, dy), nan pixels ignored.
// out5 = {mu_u, mu_v, sig_u, sig_v, xcorr}; returns overlap count.
int64_t sn_mean_std(const double* u, const double* v, int64_t h, int64_t w,
                    int dx, int dy, double* out5) {
  double su = 0.0, sv = 0.0;
  int64_t cnt = 0;
  for (int64_t j = 0; j < h; ++j) {
    const int64_t jv = j + dy;
    if (jv < 0 || jv >= h) continue;
    for (int64_t i = 0; i < w; ++i) {
      const int64_t iv = i + dx;
      if (iv < 0 || iv >= w) continue;
      const double a = u[j * w + i], b = v[jv * w + iv];
      if (std::isfinite(a) && std::isfinite(b)) {
        su += a;
        sv += b;
        ++cnt;
      }
    }
  }
  if (cnt == 0) {
    out5[0] = out5[1] = out5[2] = out5[3] = out5[4] = 0.0;
    return 0;
  }
  const double mu = su / cnt, mv = sv / cnt;
  double vu = 0.0, vv = 0.0, xc = 0.0;
  for (int64_t j = 0; j < h; ++j) {
    const int64_t jv = j + dy;
    if (jv < 0 || jv >= h) continue;
    for (int64_t i = 0; i < w; ++i) {
      const int64_t iv = i + dx;
      if (iv < 0 || iv >= w) continue;
      const double a = u[j * w + i], b = v[jv * w + iv];
      if (std::isfinite(a) && std::isfinite(b)) {
        const double da = a - mu, db = b - mv;
        vu += da * da;
        vv += db * db;
        xc += da * db;
      }
    }
  }
  out5[0] = mu;
  out5[1] = mv;
  out5[2] = std::sqrt(vu / cnt);
  out5[3] = std::sqrt(vv / cnt);
  out5[4] = xc / cnt;
  return cnt;
}

// exhaustive NCC maximisation over (initdx, initdy) +- irange; out2 = {dx, dy}.
void sn_ncc_search(const double* u, const double* v, int64_t h, int64_t w,
                   int irange, int initdx, int initdy, int* out2) {
  double best = -std::numeric_limits<double>::infinity();
  int bdx = initdx, bdy = initdy;
  double stats[5];
  for (int dy = initdy - irange; dy <= initdy + irange; ++dy) {
    for (int dx = initdx - irange; dx <= initdx + irange; ++dx) {
      const int64_t cnt = sn_mean_std(u, v, h, w, dx, dy, stats);
      if (cnt == 0) continue;
      const double denom = stats[2] * stats[3];
      const double corr = denom > 0.0 ? stats[4] / denom : 0.0;
      if (corr > best) {
        best = corr;
        bdx = dx;
        bdy = dy;
      }
    }
  }
  out2[0] = bdx;
  out2[1] = bdy;
}

// apply shift + affine z map: out(j,i) = a * v(j+dy, i+dx) + b + c*i + d*j.
void sn_apply_shift(const double* v, int64_t h, int64_t w, int dx, int dy,
                    double a, double b, double c, double d, double* out) {
  for (int64_t j = 0; j < h; ++j) {
    for (int64_t i = 0; i < w; ++i) {
      const int64_t jv = j + dy, iv = i + dx;
      double val = std::numeric_limits<double>::quiet_NaN();
      if (jv >= 0 && jv < h && iv >= 0 && iv < w) val = v[jv * w + iv];
      out[j * w + i] = a * val + b + c * (double)i + d * (double)j;
    }
  }
}

// scatter-mean rasterization of a UTM point cloud onto a north-up grid.
// cloud: (n, 3) doubles {easting, northing, alt}. A point contributes to every
// cell whose centre lies within `radius` cells (euclidean), matching
// plyflatten's radius splat with sigma=inf (plain average).
void sn_rasterize_mean(const double* cloud, int64_t n, double xoff, double yoff,
                       double resolution, int64_t xsize, int64_t ysize,
                       int radius, double* acc, double* cnt) {
  for (int64_t k = 0; k < n; ++k) {
    const double e = cloud[3 * k], nn = cloud[3 * k + 1], z = cloud[3 * k + 2];
    // all three must be finite: floor(NaN/inf)->int64 is UB
    if (!std::isfinite(e) || !std::isfinite(nn) || !std::isfinite(z)) continue;
    const double col = (e - xoff) / resolution;
    const double row = (yoff - nn) / resolution;
    // huge-but-finite coords (corrupt cloud / wrong CRS): the double->int64
    // cast below is UB outside int64 range, and anything beyond the splat
    // reach cannot touch the grid anyway — reject before casting
    const double reach = (double)radius + 1.0;
    if (col < -reach || col >= (double)xsize + reach ||
        row < -reach || row >= (double)ysize + reach)
      continue;
    const int64_t c0 = (int64_t)std::floor(col);
    const int64_t r0 = (int64_t)std::floor(row);
    for (int64_t rr = r0 - radius; rr <= r0 + radius; ++rr) {
      if (rr < 0 || rr >= ysize) continue;
      for (int64_t cc = c0 - radius; cc <= c0 + radius; ++cc) {
        if (cc < 0 || cc >= xsize) continue;
        if (radius > 0) {  // radius==0 -> exactly the containing cell
          const double dc = (cc + 0.5) - col, dr = (rr + 0.5) - row;
          if (dc * dc + dr * dr > (double)(radius * radius) + 0.25) continue;
        }
        acc[rr * xsize + cc] += z;
        cnt[rr * xsize + cc] += 1.0;
      }
    }
  }
}

// TIFF LZW decode (MSB-first bit order, "early change" code-width bump —
// the variant GDAL/libtiff write). Dictionary entries are stored as
// (prefix chain, suffix byte, length) so decoding is allocation-free; each
// emitted string is written back-to-front directly into `out`.
// Returns bytes written, -1 if `out` (capacity `cap`) is too small,
// -2 on a corrupt code stream.
int64_t sn_lzw_decode(const uint8_t* in, int64_t n, uint8_t* out,
                      int64_t cap) {
  enum { CLEAR = 256, EOI = 257, MAXCODES = 4096 };
  static thread_local int prefix[MAXCODES];
  static thread_local uint8_t suffix[MAXCODES];
  static thread_local uint8_t first[MAXCODES];  // first byte of each entry
  static thread_local int32_t length[MAXCODES];
  for (int i = 0; i < 256; ++i) {
    prefix[i] = -1;
    suffix[i] = (uint8_t)i;
    first[i] = (uint8_t)i;
    length[i] = 1;
  }
  int next = 258;   // first free code
  int bits = 9;
  int prev = -1;
  uint32_t acc = 0;
  int nbits = 0;
  int64_t pos = 0;

  auto emit = [&](int code) -> bool {  // write table[code] at pos
    const int32_t len = length[code];
    if (pos + len > cap) return false;
    int64_t p = pos + len;
    for (int c = code; c >= 0; c = prefix[c]) out[--p] = suffix[c];
    pos += len;
    return true;
  };

  for (int64_t i = 0; i < n; ++i) {
    acc = (acc << 8) | in[i];
    nbits += 8;
    while (nbits >= bits) {
      const int code = (int)((acc >> (nbits - bits)) & ((1u << bits) - 1));
      nbits -= bits;
      if (code == CLEAR) {
        next = 258;
        bits = 9;
        prev = -1;
        continue;
      }
      if (code == EOI) return pos;
      if (prev < 0) {
        if (code >= 256) return -2;
        if (!emit(code)) return -1;
      } else if (code < next) {
        if (next < MAXCODES) {
          prefix[next] = prev;
          suffix[next] = first[code];  // new entry = prev + first(table[code])
          first[next] = first[prev];
          length[next] = length[prev] + 1;
          ++next;
        }
        if (!emit(code)) return -1;
      } else if (code == next && next < MAXCODES) {
        // KwKwK case: entry = prev + first byte of prev
        prefix[next] = prev;
        suffix[next] = first[prev];
        first[next] = first[prev];
        length[next] = length[prev] + 1;
        ++next;
        if (!emit(code)) return -1;
      } else {
        return -2;
      }
      prev = code;
      // early change: widen one code before the table is actually full
      if (next >= (1 << bits) - 1 && bits < 12) ++bits;
    }
  }
  return pos;  // no EOI marker; return what we have (libtiff tolerates this)
}

}  // extern "C"
