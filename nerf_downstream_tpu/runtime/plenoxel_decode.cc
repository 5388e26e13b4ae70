// Native Plenoxel scene decoder.
//
// The reference leans on torch DataLoader C++ workers + numpy for its input
// pipeline; this library is the equivalent native component for the TPU
// build: it parses a scene's data.npz (ZIP of .npy entries, stored or
// deflate), decodes the linear `links` index into (x, y, z) voxel
// coordinates, dequantizes the uint8 SH coefficients (sh * scale + min),
// widens fp16 distances, and returns packed buffers ready for the
// fixed-capacity batcher — one pass, OpenMP-parallel, no Python in the
// loop. Exposed through ctypes (nerf_downstream_tpu/runtime/__init__.py).
//
// Schema per reference co3d_3d/scripts/preprocess.py:49-57 and
// preprocess_scannet.py:164-174.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#include <zlib.h>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct NpyArray {
  std::vector<uint8_t> data;
  std::string dtype;   // e.g. "<i8", "<f4", "|u1", "<f2"
  std::vector<int64_t> shape;

  int64_t num_elems() const {
    int64_t n = 1;
    for (auto s : shape) n *= s;
    return n;
  }
};

struct Archive {
  std::unordered_map<std::string, NpyArray> entries;
  std::string error;
};

uint16_t rd16(const uint8_t* p) { return p[0] | (p[1] << 8); }
uint32_t rd32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | (uint32_t(p[3]) << 24);
}

bool inflate_raw(const uint8_t* src, size_t src_len, uint8_t* dst,
                 size_t dst_len) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, -MAX_WBITS) != Z_OK) return false;
  zs.next_in = const_cast<uint8_t*>(src);
  zs.avail_in = static_cast<uInt>(src_len);
  zs.next_out = dst;
  zs.avail_out = static_cast<uInt>(dst_len);
  int ret = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return ret == Z_STREAM_END || (ret == Z_OK && zs.avail_out == 0);
}

bool parse_npy(const uint8_t* buf, size_t len, NpyArray* out) {
  if (len < 10 || std::memcmp(buf, "\x93NUMPY", 6) != 0) return false;
  int major = buf[6];
  size_t header_len;
  size_t header_off;
  if (major == 1) {
    header_len = rd16(buf + 8);
    header_off = 10;
  } else {
    header_len = rd32(buf + 8);
    header_off = 12;
  }
  if (header_off + header_len > len) return false;
  std::string header(reinterpret_cast<const char*>(buf + header_off),
                     header_len);
  // parse "'descr': '<i8'"
  auto dpos = header.find("'descr'");
  if (dpos == std::string::npos) return false;
  auto q1 = header.find('\'', dpos + 7);
  auto q2 = header.find('\'', q1 + 1);
  out->dtype = header.substr(q1 + 1, q2 - q1 - 1);
  // fortran_order must be False for our schema
  if (header.find("'fortran_order': True") != std::string::npos) return false;
  // parse "'shape': (a, b)"
  auto spos = header.find("'shape'");
  auto p1 = header.find('(', spos);
  auto p2 = header.find(')', p1);
  std::string dims = header.substr(p1 + 1, p2 - p1 - 1);
  out->shape.clear();
  const char* c = dims.c_str();
  while (*c) {
    while (*c == ' ' || *c == ',') c++;
    if (!*c) break;
    out->shape.push_back(strtoll(c, const_cast<char**>(&c), 10));
  }
  size_t payload = header_off + header_len;
  out->data.assign(buf + payload, buf + len);
  return true;
}

bool load_npz(const char* path, Archive* ar) {
  FILE* f = fopen(path, "rb");
  if (!f) {
    ar->error = "open failed";
    return false;
  }
  fseek(f, 0, SEEK_END);
  long fsize = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(fsize);
  if (fread(buf.data(), 1, fsize, f) != static_cast<size_t>(fsize)) {
    fclose(f);
    ar->error = "read failed";
    return false;
  }
  fclose(f);

  // find end-of-central-directory
  long eocd = -1;
  for (long i = fsize - 22; i >= 0 && i >= fsize - 22 - 65536; --i) {
    if (rd32(buf.data() + i) == 0x06054b50) {
      eocd = i;
      break;
    }
  }
  if (eocd < 0) {
    ar->error = "no zip EOCD";
    return false;
  }
  uint16_t count = rd16(buf.data() + eocd + 10);
  uint32_t cd_off = rd32(buf.data() + eocd + 16);

  size_t p = cd_off;
  for (int e = 0; e < count; ++e) {
    if (rd32(buf.data() + p) != 0x02014b50) {
      ar->error = "bad central dir";
      return false;
    }
    uint16_t method = rd16(buf.data() + p + 10);
    uint32_t csize = rd32(buf.data() + p + 20);
    uint32_t usize = rd32(buf.data() + p + 24);
    uint16_t nlen = rd16(buf.data() + p + 28);
    uint16_t xlen = rd16(buf.data() + p + 30);
    uint16_t clen = rd16(buf.data() + p + 32);
    uint32_t lho = rd32(buf.data() + p + 42);
    std::string name(reinterpret_cast<char*>(buf.data() + p + 46), nlen);
    p += 46 + nlen + xlen + clen;

    // local header
    uint16_t lnlen = rd16(buf.data() + lho + 26);
    uint16_t lxlen = rd16(buf.data() + lho + 28);
    const uint8_t* payload = buf.data() + lho + 30 + lnlen + lxlen;

    std::vector<uint8_t> raw;
    const uint8_t* npy_buf;
    size_t npy_len;
    if (method == 0) {
      npy_buf = payload;
      npy_len = csize;
    } else if (method == 8) {
      raw.resize(usize);
      if (!inflate_raw(payload, csize, raw.data(), usize)) {
        ar->error = "inflate failed: " + name;
        return false;
      }
      npy_buf = raw.data();
      npy_len = usize;
    } else {
      ar->error = "unsupported compression";
      return false;
    }
    NpyArray arr;
    if (!parse_npy(npy_buf, npy_len, &arr)) {
      ar->error = "bad npy: " + name;
      return false;
    }
    if (name.size() > 4 && name.substr(name.size() - 4) == ".npy")
      name = name.substr(0, name.size() - 4);
    ar->entries[name] = std::move(arr);
  }
  return true;
}

float half_to_float(uint16_t h) {
  uint32_t sign = (h & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1f;
  uint32_t mant = h & 0x3ff;
  uint32_t out;
  if (exp == 0) {
    if (mant == 0) {
      out = sign;
    } else {
      exp = 127 - 15 + 1;
      while (!(mant & 0x400)) {
        mant <<= 1;
        exp--;
      }
      mant &= 0x3ff;
      out = sign | (exp << 23) | (mant << 13);
    }
  } else if (exp == 31) {
    out = sign | 0x7f800000u | (mant << 13);
  } else {
    out = sign | ((exp - 15 + 127) << 23) | (mant << 13);
  }
  float f;
  std::memcpy(&f, &out, 4);
  return f;
}

template <typename T>
const T* as(const NpyArray& a) {
  return reinterpret_cast<const T*>(a.data.data());
}

double scalar_of(const NpyArray& a) {
  if (a.dtype == "<f4") return as<float>(a)[0];
  if (a.dtype == "<f8") return as<double>(a)[0];
  if (a.dtype == "<f2") return half_to_float(as<uint16_t>(a)[0]);
  if (a.dtype == "<i8") return static_cast<double>(as<int64_t>(a)[0]);
  if (a.dtype == "<i4") return as<int32_t>(a)[0];
  return 0.0;
}

}  // namespace

extern "C" {

// Queries the scene: fills n_voxels, sh_dim, reso[3], has_labels, has_dists.
// Returns 0 on success.
int plx_scene_info(const char* path, int64_t* n_voxels, int32_t* sh_dim,
                   int32_t* reso, int32_t* has_labels, int32_t* has_dists) {
  Archive ar;
  if (!load_npz(path, &ar)) return 1;
  auto it = ar.entries.find("links");
  if (it == ar.entries.end()) return 2;
  *n_voxels = it->second.num_elems();
  auto sh = ar.entries.find("sh");
  if (sh == ar.entries.end()) return 3;
  *sh_dim = static_cast<int32_t>(sh->second.shape.back());
  auto r = ar.entries.find("reso");
  if (r != ar.entries.end()) {
    const auto& a = r->second;
    for (int i = 0; i < 3; ++i) {
      if (a.dtype == "<i8")
        reso[i] = static_cast<int32_t>(as<int64_t>(a)[i]);
      else
        reso[i] = as<int32_t>(a)[i];
    }
  } else {
    reso[0] = reso[1] = reso[2] = 128;
  }
  *has_labels = ar.entries.count("labels") ? 1 : 0;
  *has_dists = ar.entries.count("dists") ? 1 : 0;
  return 0;
}

// Decodes the scene into caller-allocated buffers:
//   coords  int32 [n, 3]   (links -> x, y, z)
//   density float  [n]
//   sh      float  [n, sh_dim]  (dequantized)
//   labels  int32 [n]      (optional; pass nullptr)
//   dists   float [n]      (optional; pass nullptr)
// Returns 0 on success.
int plx_scene_load(const char* path, int32_t* coords, float* density,
                   float* sh, int32_t* labels, float* dists) {
  Archive ar;
  if (!load_npz(path, &ar)) return 1;
  const NpyArray& links = ar.entries["links"];
  const NpyArray& dens = ar.entries["density"];
  const NpyArray& shq = ar.entries["sh"];
  int64_t n = links.num_elems();
  int sh_dim = static_cast<int>(shq.shape.back());

  int64_t r1 = 128, r2 = 128;
  auto r = ar.entries.find("reso");
  if (r != ar.entries.end()) {
    const auto& a = r->second;
    r1 = (a.dtype == "<i8") ? as<int64_t>(a)[1] : as<int32_t>(a)[1];
    r2 = (a.dtype == "<i8") ? as<int64_t>(a)[2] : as<int32_t>(a)[2];
  }
  float sh_min = 0.f, sh_scale = 1.f;
  if (ar.entries.count("sh_min")) sh_min = scalar_of(ar.entries["sh_min"]);
  if (ar.entries.count("sh_scale"))
    sh_scale = scalar_of(ar.entries["sh_scale"]);

  const bool links64 = links.dtype == "<i8";
  const int64_t* l64 = as<int64_t>(links);
  const int32_t* l32 = as<int32_t>(links);
  const float* dsrc = as<float>(dens);
  const uint8_t* shsrc_u8 = as<uint8_t>(shq);
  const float* shsrc_f32 = as<float>(shq);
  const bool sh_u8 = shq.dtype == "|u1";

#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    int64_t link = links64 ? l64[i] : l32[i];
    coords[i * 3 + 0] = static_cast<int32_t>(link / (r1 * r2));
    coords[i * 3 + 1] = static_cast<int32_t>((link % (r1 * r2)) / r2);
    coords[i * 3 + 2] = static_cast<int32_t>(link % r2);
    density[i] = dsrc[i];
    for (int c = 0; c < sh_dim; ++c) {
      sh[i * sh_dim + c] =
          sh_u8 ? shsrc_u8[i * sh_dim + c] * sh_scale + sh_min
                : shsrc_f32[i * sh_dim + c] * sh_scale + sh_min;
    }
  }

  if (labels && ar.entries.count("labels")) {
    const NpyArray& la = ar.entries["labels"];
    if (la.dtype == "<i8") {
      const int64_t* src = as<int64_t>(la);
      for (int64_t i = 0; i < n; ++i) labels[i] = (int32_t)src[i];
    } else {
      std::memcpy(labels, la.data.data(), n * sizeof(int32_t));
    }
  }
  if (dists && ar.entries.count("dists")) {
    const NpyArray& da = ar.entries["dists"];
    if (da.dtype == "<f2") {
      const uint16_t* src = as<uint16_t>(da);
#pragma omp parallel for schedule(static)
      for (int64_t i = 0; i < n; ++i) dists[i] = half_to_float(src[i]);
    } else {
      std::memcpy(dists, da.data.data(), n * sizeof(float));
    }
  }
  return 0;
}

}  // extern "C"
