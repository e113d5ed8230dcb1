// m3io — native columnar event IO for mach3_tpu.
//
// TPU-native counterpart of the reference's native data path: MaCh3 loads MC
// events through ROOT TTree C++ IO before filling its event structs
// (Samples/SampleHandlerFD.cpp SetupExperimentMC). Here the on-disk format is
// a flat columnar binary ("M3EV"), written/consumed by this library and read
// zero-copy via mmap; CSV ingestion is multithreaded. Exposed to Python via
// ctypes (mach3_tpu/core/nativeio.py) with a pure-numpy fallback.
//
// Format M3EV v1 (little-endian):
//   magic[8] = "M3EV0001"
//   u64 n_events, u32 n_columns, u32 reserved
//   n_columns x { char name[64]; u32 dtype (0=f32,1=f64,2=i32); u32 pad;
//                 u64 offset_bytes }
//   column payloads, 64-byte aligned
#include <atomic>
#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

constexpr char kMagic[8] = {'M', '3', 'E', 'V', '0', '0', '0', '1'};
constexpr uint64_t kAlign = 64;

#pragma pack(push, 1)
struct Header {
  char magic[8];
  uint64_t n_events;
  uint32_t n_columns;
  uint32_t reserved;
};
struct ColumnDesc {
  char name[64];
  uint32_t dtype;
  uint32_t pad;
  uint64_t offset;
};
#pragma pack(pop)

size_t dtype_size(uint32_t dt) { return dt == 1 ? 8 : 4; }

uint64_t align_up(uint64_t x) { return (x + kAlign - 1) / kAlign * kAlign; }

}  // namespace

extern "C" {

// Write a columnar file. names: n_cols zero-terminated strings, each padded
// to 64 bytes. dtypes: n_cols codes. data: n_cols pointers.
int m3io_write(const char* path, uint64_t n_events, uint32_t n_cols,
               const char* names, const uint32_t* dtypes,
               const void* const* data) {
  FILE* f = fopen(path, "wb");
  if (!f) return -errno;
  Header h{};
  memcpy(h.magic, kMagic, 8);
  h.n_events = n_events;
  h.n_columns = n_cols;
  std::vector<ColumnDesc> cols(n_cols);
  uint64_t offset =
      align_up(sizeof(Header) + n_cols * sizeof(ColumnDesc));
  for (uint32_t c = 0; c < n_cols; ++c) {
    memset(cols[c].name, 0, 64);
    strncpy(cols[c].name, names + 64 * c, 63);
    cols[c].dtype = dtypes[c];
    cols[c].offset = offset;
    offset = align_up(offset + n_events * dtype_size(dtypes[c]));
  }
  if (fwrite(&h, sizeof(h), 1, f) != 1) { fclose(f); return -EIO; }
  if (n_cols &&
      fwrite(cols.data(), sizeof(ColumnDesc), n_cols, f) != n_cols) {
    fclose(f);
    return -EIO;
  }
  for (uint32_t c = 0; c < n_cols; ++c) {
    if (fseek(f, static_cast<long>(cols[c].offset), SEEK_SET) != 0) {
      fclose(f);
      return -EIO;
    }
    size_t bytes = n_events * dtype_size(cols[c].dtype);
    if (bytes && fwrite(data[c], 1, bytes, f) != bytes) {
      fclose(f);
      return -EIO;
    }
  }
  fclose(f);
  return 0;
}

// Read the header: fills *n_events, *n_cols. Returns 0 or -errno.
int m3io_read_header(const char* path, uint64_t* n_events, uint32_t* n_cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return -errno;
  Header h{};
  if (fread(&h, sizeof(h), 1, f) != 1 || memcmp(h.magic, kMagic, 8) != 0) {
    fclose(f);
    return -EINVAL;
  }
  *n_events = h.n_events;
  *n_cols = h.n_columns;
  fclose(f);
  return 0;
}

// Fill names (n_cols*64 bytes) and dtypes (n_cols u32).
int m3io_read_columns_meta(const char* path, char* names, uint32_t* dtypes) {
  FILE* f = fopen(path, "rb");
  if (!f) return -errno;
  Header h{};
  if (fread(&h, sizeof(h), 1, f) != 1 || memcmp(h.magic, kMagic, 8) != 0) {
    fclose(f);
    return -EINVAL;
  }
  std::vector<ColumnDesc> cols(h.n_columns);
  if (h.n_columns && fread(cols.data(), sizeof(ColumnDesc), h.n_columns, f) !=
                         h.n_columns) {
    fclose(f);
    return -EIO;
  }
  for (uint32_t c = 0; c < h.n_columns; ++c) {
    memcpy(names + 64 * c, cols[c].name, 64);
    dtypes[c] = cols[c].dtype;
  }
  fclose(f);
  return 0;
}

// Copy one column (by index) into out. mmap-backed, threads split the copy.
int m3io_read_column(const char* path, uint32_t col_index, void* out,
                     uint32_t n_threads) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -errno;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return -errno; }
  size_t fsize = static_cast<size_t>(st.st_size);
  void* base = mmap(nullptr, fsize, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (base == MAP_FAILED) return -errno;
  const Header* h = static_cast<const Header*>(base);
  if (fsize < sizeof(Header) || memcmp(h->magic, kMagic, 8) != 0 ||
      col_index >= h->n_columns) {
    munmap(base, fsize);
    return -EINVAL;
  }
  const ColumnDesc* cols = reinterpret_cast<const ColumnDesc*>(
      static_cast<const char*>(base) + sizeof(Header));
  const ColumnDesc& cd = cols[col_index];
  size_t bytes = h->n_events * dtype_size(cd.dtype);
  const char* src = static_cast<const char*>(base) + cd.offset;
  if (cd.offset + bytes > fsize) {
    munmap(base, fsize);
    return -EINVAL;
  }
  uint32_t nt = n_threads ? n_threads : 1;
  if (nt == 1 || bytes < (1u << 22)) {
    memcpy(out, src, bytes);
  } else {
    std::vector<std::thread> workers;
    size_t chunk = (bytes + nt - 1) / nt;
    for (uint32_t t = 0; t < nt; ++t) {
      size_t lo = t * chunk;
      size_t hi = lo + chunk < bytes ? lo + chunk : bytes;
      if (lo >= hi) break;
      workers.emplace_back([=]() {
        memcpy(static_cast<char*>(out) + lo, src + lo, hi - lo);
      });
    }
    for (auto& w : workers) w.join();
  }
  munmap(base, fsize);
  return 0;
}

// Multithreaded CSV -> f64 column-major parse. Returns number of rows parsed
// (>= 0) or -errno. Assumes a header line with column names; data numeric.
// out must hold n_cols * max_rows doubles (column-major).
long m3io_parse_csv(const char* path, double* out, uint64_t max_rows,
                    uint32_t n_cols, uint32_t n_threads) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -errno;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return -errno; }
  size_t fsize = static_cast<size_t>(st.st_size);
  if (fsize == 0) { close(fd); return 0; }
  char* base = static_cast<char*>(mmap(nullptr, fsize, PROT_READ, MAP_PRIVATE, fd, 0));
  close(fd);
  if (base == MAP_FAILED) return -errno;

  // Skip header line.
  size_t data_start = 0;
  while (data_start < fsize && base[data_start] != '\n') ++data_start;
  ++data_start;

  // Index line starts (serial scan; cheap relative to float parsing).
  std::vector<size_t> lines;
  lines.reserve(1 << 16);
  for (size_t i = data_start; i < fsize;) {
    lines.push_back(i);
    while (i < fsize && base[i] != '\n') ++i;
    ++i;
  }
  uint64_t n_rows = lines.size() < max_rows ? lines.size() : max_rows;

  uint32_t nt = n_threads ? n_threads : 1;
  std::atomic<long> err{0};
  auto parse_range = [&](uint64_t lo, uint64_t hi) {
    for (uint64_t r = lo; r < hi; ++r) {
      const char* p = base + lines[r];
      for (uint32_t c = 0; c < n_cols; ++c) {
        char* end = nullptr;
        double v = strtod(p, &end);
        if (end == p) { err.store(-EINVAL); return; }
        out[static_cast<uint64_t>(c) * max_rows + r] = v;
        p = end;
        while (*p == ',' || *p == ' ' || *p == '\t') ++p;
      }
    }
  };
  if (nt == 1) {
    parse_range(0, n_rows);
  } else {
    std::vector<std::thread> workers;
    uint64_t chunk = (n_rows + nt - 1) / nt;
    for (uint32_t t = 0; t < nt; ++t) {
      uint64_t lo = t * chunk;
      uint64_t hi = lo + chunk < n_rows ? lo + chunk : n_rows;
      if (lo >= hi) break;
      workers.emplace_back(parse_range, lo, hi);
    }
    for (auto& w : workers) w.join();
  }
  munmap(base, fsize);
  if (err.load() != 0) return err.load();
  return static_cast<long>(n_rows);
}

}  // extern "C"
