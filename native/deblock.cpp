// brief-tpu deblock — native post-processing tool.
//
// H.264-style deblocking filter over INR block boundaries for multi-page
// grayscale TIFF volumes (uint8/uint16).  Counterpart of
// brief_pytorch_tpu/post/deblock.py with bit-identical integer arithmetic
// (verified by tests/test_deblock.py).  Capability parity with the
// reference's only native component (reference deblock.cpp:13-329); the
// boundary-line list is derived from the compressed module directory names
// 'd_{z0}_{z1}-h_{y0}_{y1}-w_{x0}_{x1}' (3-D) or 'h_..-w_..' (2-D),
// matching reference deblock.py:95-132 including its z-range dedup quirk.
//
// Build:  g++ -O2 -o deblock deblock.cpp -ltiff
// Usage:  ./deblock <step_dir> [index_a index_b thres]
//         ./deblock --file <in.tif> --modules <module_dir> --out <out.tif>
//                   [index_a index_b thres]

#include <tiffio.h>

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <dirent.h>
#include <set>
#include <string>
#include <sys/stat.h>
#include <vector>

#include <cstdio>

namespace {

// ---------------------------------------------------------------- volume --
struct Volume {
  uint32_t d = 0, h = 0, w = 0;
  uint16_t bits = 16;
  std::vector<uint16_t> data;  // page-major, row-major; uint8 widened

  int64_t at(uint32_t z, uint32_t y, uint32_t x) const {
    return data[(size_t)z * h * w + (size_t)y * w + x];
  }
  void set(uint32_t z, uint32_t y, uint32_t x, int64_t v) {
    data[(size_t)z * h * w + (size_t)y * w + x] = (uint16_t)v;
  }
};

bool read_tiff(const std::string &path, Volume &vol) {
  TIFF *tif = TIFFOpen(path.c_str(), "r");
  if (!tif) return false;
  uint32_t w = 0, h = 0;
  uint16_t bits = 0, spp = 1;
  int pages = 0;
  do { ++pages; } while (TIFFReadDirectory(tif));
  TIFFSetDirectory(tif, 0);
  TIFFGetField(tif, TIFFTAG_IMAGEWIDTH, &w);
  TIFFGetField(tif, TIFFTAG_IMAGELENGTH, &h);
  TIFFGetField(tif, TIFFTAG_BITSPERSAMPLE, &bits);
  TIFFGetFieldDefaulted(tif, TIFFTAG_SAMPLESPERPIXEL, &spp);
  if (spp != 1 || (bits != 8 && bits != 16)) {
    std::fprintf(stderr, "deblock: only 1-sample 8/16-bit TIFF supported\n");
    TIFFClose(tif);
    return false;
  }
  vol.d = pages; vol.h = h; vol.w = w; vol.bits = bits;
  vol.data.assign((size_t)pages * h * w, 0);
  std::vector<uint8_t> scan(TIFFScanlineSize(tif));
  for (int p = 0; p < pages; ++p) {
    TIFFSetDirectory(tif, p);
    for (uint32_t y = 0; y < h; ++y) {
      if (TIFFReadScanline(tif, scan.data(), y) < 0) {
        TIFFClose(tif);
        return false;
      }
      uint16_t *row = &vol.data[(size_t)p * h * w + (size_t)y * w];
      if (bits == 16)
        std::memcpy(row, scan.data(), (size_t)w * 2);
      else
        for (uint32_t x = 0; x < w; ++x) row[x] = scan[x];
    }
  }
  TIFFClose(tif);
  return true;
}

bool write_tiff(const std::string &path, const Volume &vol) {
  TIFF *tif = TIFFOpen(path.c_str(), "w");
  if (!tif) return false;
  std::vector<uint8_t> scan((size_t)vol.w * (vol.bits / 8));
  for (uint32_t p = 0; p < vol.d; ++p) {
    TIFFSetField(tif, TIFFTAG_IMAGEWIDTH, vol.w);
    TIFFSetField(tif, TIFFTAG_IMAGELENGTH, vol.h);
    TIFFSetField(tif, TIFFTAG_BITSPERSAMPLE, vol.bits);
    TIFFSetField(tif, TIFFTAG_SAMPLESPERPIXEL, 1);
    TIFFSetField(tif, TIFFTAG_PHOTOMETRIC, PHOTOMETRIC_MINISBLACK);
    TIFFSetField(tif, TIFFTAG_PLANARCONFIG, PLANARCONFIG_CONTIG);
    TIFFSetField(tif, TIFFTAG_COMPRESSION, COMPRESSION_NONE);
    TIFFSetField(tif, TIFFTAG_ROWSPERSTRIP, 1);
    if (vol.d > 1) {
      TIFFSetField(tif, TIFFTAG_SUBFILETYPE, FILETYPE_PAGE);
      TIFFSetField(tif, TIFFTAG_PAGENUMBER, (uint16_t)p, (uint16_t)vol.d);
    }
    for (uint32_t y = 0; y < vol.h; ++y) {
      const uint16_t *row = &vol.data[(size_t)p * vol.h * vol.w + (size_t)y * vol.w];
      if (vol.bits == 16)
        std::memcpy(scan.data(), row, (size_t)vol.w * 2);
      else
        for (uint32_t x = 0; x < vol.w; ++x) scan[x] = (uint8_t)row[x];
      if (TIFFWriteScanline(tif, scan.data(), y) < 0) {
        TIFFClose(tif);
        return false;
      }
    }
    TIFFWriteDirectory(tif);
  }
  TIFFClose(tif);
  return true;
}

// ---------------------------------------------------------------- filter --
// Integer H.264-style edge filter; must stay bit-identical to
// brief_pytorch_tpu/post/deblock.py::filter_line_windows.
struct Params {
  double alpha_a, beta_b;
  int64_t thres;
};

inline int64_t trunc_div(int64_t a, int64_t b) { return a / b; }  // C trunc

inline bool judge(int64_t p1, int64_t p0, int64_t q0, int64_t q1,
                  const Params &prm) {
  if ((p1 + p0 + q0 + q1) / 4 > prm.thres) return false;  // bright area
  return std::llabs(p0 - q0) < prm.alpha_a &&
         std::llabs(p1 - p0) < prm.beta_b &&
         std::llabs(q1 - q0) < prm.beta_b;
}

inline void filter_window(int64_t p2, int64_t &p1, int64_t &p0, int64_t &q0,
                          int64_t &q1, int64_t q2, const Params &prm) {
  int64_t delta0 = trunc_div(4 * (q0 - p0) + (p1 - q1) + 4, 8);
  int64_t mid = trunc_div(p0 + q0 + 1, 2);
  int64_t dp1 = trunc_div(p2 + mid - 2 * p1, 2);
  int64_t dq1 = trunc_div(q2 + mid - 2 * q1, 2);
  int64_t c1 = 20;
  int64_t c0 = c1 + (std::llabs(p2 - p0) < prm.beta_b ? 1 : 0) +
               (std::llabs(q2 - q0) < prm.beta_b ? 1 : 0);
  delta0 = std::clamp(delta0, -c0, c0);
  dp1 = std::clamp(dp1, -c1, c1);
  dq1 = std::clamp(dq1, -c1, c1);
  p1 += dp1;
  p0 += delta0;
  q0 -= delta0;
  q1 += dq1;
}

// One boundary line on one depth slice: (x1,y1,x2,y2), x1==x2 vertical.
void filter_line(Volume &vol, uint32_t z, int x1, int y1, int x2, int y2,
                 const Params &prm) {
  const int W = (int)vol.w, H = (int)vol.h;
  if (x1 == x2) {
    int x = x1;
    if (x - 3 < 0 || x + 3 > W - 1) return;
    for (int y = y1; y <= y2; ++y) {
      int64_t p2 = vol.at(z, y, x - 3), p1 = vol.at(z, y, x - 2),
              p0 = vol.at(z, y, x - 1), q0 = vol.at(z, y, x),
              q1 = vol.at(z, y, x + 1), q2 = vol.at(z, y, x + 2);
      if (!judge(p1, p0, q0, q1, prm)) continue;
      filter_window(p2, p1, p0, q0, q1, q2, prm);
      vol.set(z, y, x - 2, p1);
      vol.set(z, y, x - 1, p0);
      vol.set(z, y, x, q0);
      vol.set(z, y, x + 1, q1);
    }
  } else if (y1 == y2) {
    int y = y1;
    if (y - 3 < 0 || y + 3 > H - 1) return;
    for (int x = x1; x <= x2; ++x) {
      int64_t p2 = vol.at(z, y - 3, x), p1 = vol.at(z, y - 2, x),
              p0 = vol.at(z, y - 1, x), q0 = vol.at(z, y, x),
              q1 = vol.at(z, y + 1, x), q2 = vol.at(z, y + 2, x);
      if (!judge(p1, p0, q0, q1, prm)) continue;
      filter_window(p2, p1, p0, q0, q1, q2, prm);
      vol.set(z, y - 2, x, p1);
      vol.set(z, y - 1, x, p0);
      vol.set(z, y, x, q0);
      vol.set(z, y + 1, x, q1);
    }
  }
}

// ----------------------------------------------------------------- lines --
using Line = std::array<int, 5>;  // z, x1, y1, x2, y2 (z=-1 for 2-D)

std::vector<std::string> list_dir(const std::string &dir) {
  std::vector<std::string> names;
  DIR *dp = opendir(dir.c_str());
  if (!dp) return names;
  while (dirent *e = readdir(dp)) {
    std::string n = e->d_name;
    if (n != "." && n != "..") names.push_back(n);
  }
  closedir(dp);
  std::sort(names.begin(), names.end());
  return names;
}

bool parse_range(const std::string &part, int &a, int &b) {
  // "w_12_63" -> a=12 b=63
  size_t u1 = part.find('_');
  if (u1 == std::string::npos) return false;
  size_t u2 = part.find('_', u1 + 1);
  if (u2 == std::string::npos) return false;
  a = std::atoi(part.substr(u1 + 1, u2 - u1 - 1).c_str());
  b = std::atoi(part.substr(u2 + 1).c_str());
  return true;
}

std::vector<Line> collect_lines(const std::vector<std::string> &blocks) {
  std::vector<Line> lines;
  std::set<Line> seen;
  auto push = [&](const Line &l) {
    if (seen.insert(l).second) lines.push_back(l);
  };
  for (const auto &name : blocks) {
    // split on '-'
    std::vector<std::string> parts;
    size_t pos = 0;
    while (true) {
      size_t nxt = name.find('-', pos);
      parts.push_back(name.substr(pos, nxt - pos));
      if (nxt == std::string::npos) break;
      pos = nxt + 1;
    }
    int x1, x2, y1, y2;
    if (parts.size() == 2) {  // 2-D: h_.._..-w_.._..
      if (!parse_range(parts[0], y1, y2) || !parse_range(parts[1], x1, x2))
        continue;
      push({-1, x1, y1, x1, y2});
      push({-1, x2, y1, x2, y2});
      push({-1, x1, y1, x2, y1});
      push({-1, x1, y2, x2, y2});
    } else if (parts.size() == 3) {  // 3-D: d-h-w
      int z1, z2;
      if (!parse_range(parts[0], z1, z2) || !parse_range(parts[1], y1, y2) ||
          !parse_range(parts[2], x1, x2))
        continue;
      // Reference quirk (deblock.py:120-132): presence checked at z1 only,
      // then the whole z range is appended.
      bool l_new = !seen.count({z1, x1, y1, x1, y2});
      bool r_new = !seen.count({z1, x2, y1, x2, y2});
      bool d_new = !seen.count({z1, x1, y1, x2, y1});
      bool u_new = !seen.count({z1, x1, y2, x2, y2});
      for (int i = z1; i <= z2; ++i) {
        if (l_new) push({i, x1, y1, x1, y2});
        if (r_new) push({i, x2, y1, x2, y2});
        if (d_new) push({i, x1, y1, x2, y1});
        if (u_new) push({i, x1, y2, x2, y2});
      }
    }
  }
  return lines;
}

bool exists(const std::string &p) {
  struct stat st;
  return stat(p.c_str(), &st) == 0;
}

}  // namespace

int main(int argc, char **argv) {
  double index_a = 51, index_b = 2000, thres = 65535;
  std::string in_path, module_dir, out_path, step_dir;

  std::vector<std::string> pos;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    if (a == "--file" && i + 1 < argc) in_path = argv[++i];
    else if (a == "--modules" && i + 1 < argc) module_dir = argv[++i];
    else if (a == "--out" && i + 1 < argc) out_path = argv[++i];
    else pos.push_back(a);
  }
  if (in_path.empty()) {
    if (pos.empty()) {
      std::fprintf(stderr,
                   "usage: deblock <step_dir> [index_a index_b thres]\n"
                   "       deblock --file in.tif --modules dir --out out.tif"
                   " [index_a index_b thres]\n");
      return 2;
    }
    step_dir = pos[0];
    pos.erase(pos.begin());
    std::string dec = step_dir + "/decompressed";
    auto names = list_dir(dec);
    if (names.empty()) {
      std::fprintf(stderr, "deblock: no file in %s\n", dec.c_str());
      return 1;
    }
    in_path = dec + "/" + names[0];
    module_dir = step_dir + "/compressed/module";
    std::string save_dir = step_dir + "/deblock";
    if (!exists(save_dir)) mkdir(save_dir.c_str(), 0755);
    std::string stem = names[0].substr(0, names[0].size() - 4);
    out_path = save_dir + "/" + stem + "_deblocked_cpp.tif";
  }
  if (pos.size() >= 1) index_a = std::atof(pos[0].c_str());
  if (pos.size() >= 2) index_b = std::atof(pos[1].c_str());
  if (pos.size() >= 3) thres = std::atof(pos[2].c_str());

  Volume vol;
  if (!read_tiff(in_path, vol)) {
    std::fprintf(stderr, "deblock: cannot read %s\n", in_path.c_str());
    return 1;
  }
  auto blocks = list_dir(module_dir);
  auto lines = collect_lines(blocks);
  Params prm{0.8 * (std::pow(2.0, index_a / 6.0) - 1.0),
             0.5 * index_b - 7.0, (int64_t)thres};
  std::printf("deblock: %ux%ux%u, %zu blocks, %zu lines, "
              "index_a=%g index_b=%g thres=%g\n",
              vol.d, vol.h, vol.w, blocks.size(), lines.size(), index_a,
              index_b, thres);
  for (const auto &l : lines) {
    if (l[0] < 0)
      for (uint32_t z = 0; z < vol.d; ++z)
        filter_line(vol, z, l[1], l[2], l[3], l[4], prm);
    else if ((uint32_t)l[0] < vol.d)
      filter_line(vol, (uint32_t)l[0], l[1], l[2], l[3], l[4], prm);
  }
  if (!write_tiff(out_path, vol)) {
    std::fprintf(stderr, "deblock: cannot write %s\n", out_path.c_str());
    return 1;
  }
  std::printf("deblock: wrote %s\n", out_path.c_str());
  return 0;
}
