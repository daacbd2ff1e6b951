// Native .npz checkpoint writer (STORED zip of .npy members).
//
// The role of cnpy in the reference C++ tree (cpp/src/utils/io.cpp +
// third_party/cnpy): checkpoints in the exact numpy .npz container, written
// from native code so the SLAM loop's checkpoint cadence does not stall the
// Python host thread (io is called from a worker thread via ctypes, which
// releases the GIL for the duration of the call).
//
// Entries are STORED (no compression) — matching np.savez (not _compressed)
// and keeping the writer dependency-free.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

uint32_t crc32_update(uint32_t crc, const uint8_t* buf, size_t len) {
  static uint32_t table[256];
  static bool init = false;
  if (!init) {
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t c = i;
      for (int k = 0; k < 8; ++k)
        c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
      table[i] = c;
    }
    init = true;
  }
  crc = ~crc;
  for (size_t i = 0; i < len; ++i)
    crc = table[(crc ^ buf[i]) & 0xFF] ^ (crc >> 8);
  return ~crc;
}

void put16(std::vector<uint8_t>& v, uint16_t x) {
  v.push_back(x & 0xFF); v.push_back((x >> 8) & 0xFF);
}
void put32(std::vector<uint8_t>& v, uint32_t x) {
  for (int i = 0; i < 4; ++i) v.push_back((x >> (8 * i)) & 0xFF);
}

std::string npy_header(const char* dtype, const int64_t* shape, int ndim) {
  std::string dict = "{'descr': '";
  dict += dtype;
  dict += "', 'fortran_order': False, 'shape': (";
  for (int i = 0; i < ndim; ++i) {
    dict += std::to_string(shape[i]);
    if (ndim == 1 || i + 1 < ndim) dict += ",";
    if (i + 1 < ndim) dict += " ";
  }
  dict += "), }";
  size_t total = 10 + dict.size() + 1;          // magic+ver+len + dict + \n
  size_t pad = (64 - (total % 64)) % 64;
  dict += std::string(pad, ' ');
  dict += '\n';
  std::string h = "\x93NUMPY";
  h += '\x01'; h += '\x00';
  uint16_t hl = uint16_t(dict.size());
  h += char(hl & 0xFF); h += char((hl >> 8) & 0xFF);
  h += dict;
  return h;
}

}  // namespace

extern "C" {

// names: array of C strings; dtypes: numpy descrs ("<f4", "<i8", ...);
// ndims/shapes flattened; data: raw C-order buffers. Returns 0 on success.
int npz_write(const char* path, int n_arrays, const char** names,
              const char** dtypes, const int* ndims,
              const int64_t* shapes_flat, const void** data) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return 1;

  struct Central { std::string name; uint32_t crc, size, offset; };
  std::vector<Central> central;
  int shape_pos = 0;
  uint32_t offset = 0;

  for (int a = 0; a < n_arrays; ++a) {
    const int64_t* shape = shapes_flat + shape_pos;
    int nd = ndims[a];
    shape_pos += nd;
    std::string header = npy_header(dtypes[a], shape, nd);
    int64_t elems = 1;
    for (int i = 0; i < nd; ++i) elems *= shape[i];
    // element size from descr, e.g. "<f4" -> 4
    int esize = std::atoi(dtypes[a] + 2);
    uint64_t payload = header.size() + uint64_t(elems) * esize;
    if (payload > 0xFFFFFFFFull) { std::fclose(f); return 2; }

    uint32_t crc = crc32_update(0, (const uint8_t*)header.data(),
                                header.size());
    crc = crc32_update(crc, (const uint8_t*)data[a],
                       size_t(elems) * esize);

    std::string member = std::string(names[a]) + ".npy";
    std::vector<uint8_t> lfh;
    put32(lfh, 0x04034b50);
    put16(lfh, 20); put16(lfh, 0); put16(lfh, 0);   // ver, flags, STORED
    put16(lfh, 0); put16(lfh, 0);                   // time, date
    put32(lfh, crc);
    put32(lfh, uint32_t(payload)); put32(lfh, uint32_t(payload));
    put16(lfh, uint16_t(member.size())); put16(lfh, 0);
    std::fwrite(lfh.data(), 1, lfh.size(), f);
    std::fwrite(member.data(), 1, member.size(), f);
    std::fwrite(header.data(), 1, header.size(), f);
    std::fwrite(data[a], esize, size_t(elems), f);

    central.push_back({member, crc, uint32_t(payload), offset});
    offset += uint32_t(lfh.size() + member.size() + payload);
  }

  uint32_t cd_start = offset;
  uint32_t cd_size = 0;
  for (auto& c : central) {
    std::vector<uint8_t> cdh;
    put32(cdh, 0x02014b50);
    put16(cdh, 20); put16(cdh, 20); put16(cdh, 0); put16(cdh, 0);
    put16(cdh, 0); put16(cdh, 0);
    put32(cdh, c.crc); put32(cdh, c.size); put32(cdh, c.size);
    put16(cdh, uint16_t(c.name.size()));
    put16(cdh, 0); put16(cdh, 0); put16(cdh, 0); put16(cdh, 0);
    put32(cdh, 0); put32(cdh, c.offset);
    std::fwrite(cdh.data(), 1, cdh.size(), f);
    std::fwrite(c.name.data(), 1, c.name.size(), f);
    cd_size += uint32_t(cdh.size() + c.name.size());
  }
  std::vector<uint8_t> eocd;
  put32(eocd, 0x06054b50);
  put16(eocd, 0); put16(eocd, 0);
  put16(eocd, uint16_t(central.size()));
  put16(eocd, uint16_t(central.size()));
  put32(eocd, cd_size); put32(eocd, cd_start);
  put16(eocd, 0);
  std::fwrite(eocd.data(), 1, eocd.size(), f);
  std::fclose(f);
  return 0;
}

}  // extern "C"
