// ndrio: native IO runtime for ndr_tpu.
//
// The reference keeps its mesh/field IO in C++ (MeshFEM MSHFieldWriter/
// MSHFieldParser, ~MeshFEM/src/lib/MeshFEM/MSHFieldWriter.hh) because
// serializing multi-million-voxel meshes in Python is minutes of pure
// interpreter overhead. This library provides the same capabilities for
// the TPU framework's regular voxel grids:
//
//   * Gmsh 2.2 BINARY mesh + per-element scalar field writer (quad/hex
//     connectivity is generated on the fly from the grid shape — no
//     index buffers are ever built in Python);
//   * Gmsh 2.2 element-field reader (binary and ASCII);
//   * VTK XML RectilinearGrid (.vtr) writer with raw appended binary
//     payload (ParaView-compatible, like pyevtk.gridToVTK used by the
//     reference, utils.py:350-376);
//   * 16-bit big-endian CT slice loader (reference: utils.load_ct,
//     utils.py:379-406), multithreaded across slices.
//
// Exposed as a plain C API consumed via ctypes (no pybind dependency).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>
#include <thread>
#include <algorithm>

namespace {

// Gmsh element type ids
constexpr int GMSH_QUAD = 3;
constexpr int GMSH_HEX = 5;

struct GridShape {
  int ndim;
  int64_t nx, ny, nz;  // elements per dim (nz=1 in 2D)
  int64_t nodes_x() const { return nx + 1; }
  int64_t nodes_y() const { return ny + 1; }
  int64_t nodes_z() const { return ndim == 3 ? nz + 1 : 1; }
  int64_t num_elements() const { return nx * ny * (ndim == 3 ? nz : 1); }
  int64_t num_nodes() const { return nodes_x() * nodes_y() * nodes_z(); }
  // C-order node flat index (x slowest), matching ndr_tpu.grid
  int64_t node_id(int64_t i, int64_t j, int64_t k) const {
    return (i * nodes_y() + j) * nodes_z() + k;
  }
};

}  // namespace

extern "C" {

// Write a Gmsh 2.2 binary mesh of the voxel grid with one per-element
// scalar field. Returns 0 on success.
int ndrio_write_msh(const char* path, int ndim, const int64_t* dims,
                    const double* origin, const double* spacing,
                    const char* field_name, const double* field,
                    int64_t field_len) {
  GridShape g{ndim, dims[0], dims[1], ndim == 3 ? dims[2] : 1};
  if (field_len != g.num_elements()) return 2;
  FILE* f = std::fopen(path, "wb");
  if (!f) return 1;

  std::fprintf(f, "$MeshFormat\n2.2 1 8\n");
  int one = 1;
  std::fwrite(&one, 4, 1, f);
  std::fprintf(f, "\n$EndMeshFormat\n");

  // ---- nodes ----
  std::fprintf(f, "$Nodes\n%lld\n", (long long)g.num_nodes());
  {
    std::vector<char> buf;
    buf.reserve((size_t)g.num_nodes() * (4 + 24));
    for (int64_t i = 0; i < g.nodes_x(); ++i)
      for (int64_t j = 0; j < g.nodes_y(); ++j)
        for (int64_t k = 0; k < g.nodes_z(); ++k) {
          int32_t id = (int32_t)(g.node_id(i, j, k) + 1);
          double xyz[3] = {origin[0] + spacing[0] * i,
                           origin[1] + spacing[1] * j,
                           ndim == 3 ? origin[2] + spacing[2] * k : 0.0};
          size_t off = buf.size();
          buf.resize(off + 4 + 24);
          std::memcpy(&buf[off], &id, 4);
          std::memcpy(&buf[off + 4], xyz, 24);
        }
    std::fwrite(buf.data(), 1, buf.size(), f);
  }
  std::fprintf(f, "\n$EndNodes\n");

  // ---- elements ----
  const int etype = ndim == 3 ? GMSH_HEX : GMSH_QUAD;
  const int npe = ndim == 3 ? 8 : 4;
  std::fprintf(f, "$Elements\n%lld\n", (long long)g.num_elements());
  {
    // header: elm-type, num-of-elm-of-type, num-tags
    int32_t hdr[3] = {etype, (int32_t)g.num_elements(), 2};
    std::fwrite(hdr, 4, 3, f);
    std::vector<int32_t> rec(3 + npe);
    rec[1] = 0;  // physical tag
    rec[2] = 0;  // geometric tag
    int32_t eid = 1;
    const int64_t nzc = ndim == 3 ? g.nz : 1;
    for (int64_t i = 0; i < g.nx; ++i)
      for (int64_t j = 0; j < g.ny; ++j)
        for (int64_t k = 0; k < nzc; ++k) {
          rec[0] = eid++;
          if (ndim == 2) {
            // gmsh quad: ccw (i,j),(i+1,j),(i+1,j+1),(i,j+1)
            rec[3] = (int32_t)(g.node_id(i, j, 0) + 1);
            rec[4] = (int32_t)(g.node_id(i + 1, j, 0) + 1);
            rec[5] = (int32_t)(g.node_id(i + 1, j + 1, 0) + 1);
            rec[6] = (int32_t)(g.node_id(i, j + 1, 0) + 1);
          } else {
            // gmsh hex: bottom face ccw, then top face ccw
            rec[3] = (int32_t)(g.node_id(i, j, k) + 1);
            rec[4] = (int32_t)(g.node_id(i + 1, j, k) + 1);
            rec[5] = (int32_t)(g.node_id(i + 1, j + 1, k) + 1);
            rec[6] = (int32_t)(g.node_id(i, j + 1, k) + 1);
            rec[7] = (int32_t)(g.node_id(i, j, k + 1) + 1);
            rec[8] = (int32_t)(g.node_id(i + 1, j, k + 1) + 1);
            rec[9] = (int32_t)(g.node_id(i + 1, j + 1, k + 1) + 1);
            rec[10] = (int32_t)(g.node_id(i, j + 1, k + 1) + 1);
          }
          std::fwrite(rec.data(), 4, rec.size(), f);
        }
  }
  std::fprintf(f, "\n$EndElements\n");

  // ---- element data ----
  std::fprintf(f, "$ElementData\n1\n\"%s\"\n1\n0.0\n3\n0\n1\n%lld\n",
               field_name, (long long)field_len);
  {
    std::vector<char> buf((size_t)field_len * 12);
    for (int64_t e = 0; e < field_len; ++e) {
      int32_t id = (int32_t)(e + 1);
      std::memcpy(&buf[(size_t)e * 12], &id, 4);
      std::memcpy(&buf[(size_t)e * 12 + 4], &field[e], 8);
    }
    std::fwrite(buf.data(), 1, buf.size(), f);
  }
  std::fprintf(f, "\n$EndElementData\n");
  std::fclose(f);
  return 0;
}

// Read a per-element scalar field from a Gmsh 2.2 file (binary or ascii).
// `out` must have room for `out_len` doubles; returns the number of
// values read, or a negative error code.
int64_t ndrio_read_msh_field(const char* path, const char* field_name,
                             double* out, int64_t out_len) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char line[512];
  bool binary = false;
  int64_t count = -2;  // not found
  while (std::fgets(line, sizeof line, f)) {
    if (std::strncmp(line, "$MeshFormat", 11) == 0) {
      if (!std::fgets(line, sizeof line, f)) break;
      double ver;
      int isbin, dsize;
      std::sscanf(line, "%lf %d %d", &ver, &isbin, &dsize);
      binary = isbin != 0;
      if (binary) {
        int32_t one;
        if (std::fread(&one, 4, 1, f) != 1) break;
      }
    } else if (std::strncmp(line, "$ElementData", 12) == 0) {
      // string tags
      if (!std::fgets(line, sizeof line, f)) break;
      long nstr = std::strtol(line, nullptr, 10);
      std::string name;
      for (long s = 0; s < nstr; ++s) {
        if (!std::fgets(line, sizeof line, f)) break;
        if (s == 0) {
          name = line;
          name.erase(std::remove(name.begin(), name.end(), '"'), name.end());
          while (!name.empty() && (name.back() == '\n' || name.back() == '\r'))
            name.pop_back();
        }
      }
      if (!std::fgets(line, sizeof line, f)) break;  // num real tags
      long nreal = std::strtol(line, nullptr, 10);
      for (long s = 0; s < nreal; ++s)
        if (!std::fgets(line, sizeof line, f)) break;
      if (!std::fgets(line, sizeof line, f)) break;  // num int tags
      long nint = std::strtol(line, nullptr, 10);
      long long nvals = 0;
      for (long s = 0; s < nint; ++s) {
        if (!std::fgets(line, sizeof line, f)) break;
        nvals = std::strtoll(line, nullptr, 10);  // last int tag = count
      }
      bool match = (name == field_name);
      if (match && nvals > out_len) {
        std::fclose(f);
        return -3;
      }
      if (binary) {
        std::vector<char> buf((size_t)nvals * 12);
        if (std::fread(buf.data(), 1, buf.size(), f) != buf.size()) break;
        if (match) {
          for (long long e = 0; e < nvals; ++e) {
            int32_t id;
            double v;
            std::memcpy(&id, &buf[(size_t)e * 12], 4);
            std::memcpy(&v, &buf[(size_t)e * 12 + 4], 8);
            if (id >= 1 && id <= nvals) out[id - 1] = v;
          }
          count = nvals;
        }
      } else {
        for (long long e = 0; e < nvals; ++e) {
          if (!std::fgets(line, sizeof line, f)) break;
          if (match) {
            long long id;
            double v;
            std::sscanf(line, "%lld %lf", &id, &v);
            if (id >= 1 && id <= nvals) out[id - 1] = v;
          }
        }
        if (match) count = nvals;
      }
      if (count >= 0) break;
    }
  }
  std::fclose(f);
  return count;
}

// Write a VTK XML RectilinearGrid with raw appended binary cell data.
int ndrio_write_vtr(const char* path, const int64_t* dims,
                    const double* origin, const double* spacing,
                    const char* field_name, const double* field) {
  int64_t nx = dims[0], ny = dims[1], nz = dims[2];
  int64_t ncells = nx * ny * nz;
  FILE* f = std::fopen(path, "wb");
  if (!f) return 1;

  // offsets into the appended data block
  uint64_t off = 0;
  uint64_t coord_bytes[3];
  int64_t npts[3] = {nx + 1, ny + 1, nz + 1};
  uint64_t coord_off[3];
  for (int d = 0; d < 3; ++d) {
    coord_off[d] = off;
    coord_bytes[d] = (uint64_t)npts[d] * 8;
    off += 8 + coord_bytes[d];  // 8-byte header + payload
  }
  uint64_t cell_off = off;

  std::fprintf(f,
               "<?xml version=\"1.0\"?>\n"
               "<VTKFile type=\"RectilinearGrid\" version=\"1.0\" "
               "byte_order=\"LittleEndian\" header_type=\"UInt64\">\n"
               "  <RectilinearGrid WholeExtent=\"0 %lld 0 %lld 0 %lld\">\n"
               "    <Piece Extent=\"0 %lld 0 %lld 0 %lld\">\n"
               "      <Coordinates>\n",
               (long long)nx, (long long)ny, (long long)nz, (long long)nx,
               (long long)ny, (long long)nz);
  const char* names[3] = {"X", "Y", "Z"};
  for (int d = 0; d < 3; ++d)
    std::fprintf(f,
                 "        <DataArray type=\"Float64\" Name=\"%s\" "
                 "format=\"appended\" offset=\"%llu\"/>\n",
                 names[d], (unsigned long long)coord_off[d]);
  std::fprintf(f,
               "      </Coordinates>\n      <CellData>\n"
               "        <DataArray type=\"Float64\" Name=\"%s\" "
               "format=\"appended\" offset=\"%llu\"/>\n"
               "      </CellData>\n    </Piece>\n  </RectilinearGrid>\n"
               "  <AppendedData encoding=\"raw\">\n_",
               field_name, (unsigned long long)cell_off);

  for (int d = 0; d < 3; ++d) {
    uint64_t nbytes = coord_bytes[d];
    std::fwrite(&nbytes, 8, 1, f);
    std::vector<double> ax(npts[d]);
    for (int64_t i = 0; i < npts[d]; ++i) ax[i] = origin[d] + spacing[d] * i;
    std::fwrite(ax.data(), 8, ax.size(), f);
  }
  {
    uint64_t nbytes = (uint64_t)ncells * 8;
    std::fwrite(&nbytes, 8, 1, f);
    // our fields are C-order (x slowest); VTK wants x fastest
    std::vector<double> reordered((size_t)ncells);
    for (int64_t k = 0; k < nz; ++k)
      for (int64_t j = 0; j < ny; ++j)
        for (int64_t i = 0; i < nx; ++i)
          reordered[(size_t)((k * ny + j) * nx + i)] =
              field[(i * ny + j) * nz + k];
    std::fwrite(reordered.data(), 8, reordered.size(), f);
  }
  std::fprintf(f, "\n  </AppendedData>\n</VTKFile>\n");
  std::fclose(f);
  return 0;
}

// Load n 16-bit big-endian CT slices into a float32 volume (values
// scaled to [0,1]); multithreaded across slices.
// paths: concatenated NUL-separated file names.
int ndrio_load_ct_slices(const char* paths, int n_slices, int64_t h,
                         int64_t w, float* out) {
  std::vector<std::string> files;
  const char* p = paths;
  for (int i = 0; i < n_slices; ++i) {
    files.emplace_back(p);
    p += files.back().size() + 1;
  }
  std::vector<int> status(n_slices, 0);
  auto work = [&](int begin, int end) {
    std::vector<uint8_t> buf((size_t)h * w * 2);
    for (int s = begin; s < end; ++s) {
      FILE* f = std::fopen(files[s].c_str(), "rb");
      if (!f) {
        status[s] = 1;
        continue;
      }
      if (std::fread(buf.data(), 1, buf.size(), f) != buf.size()) status[s] = 2;
      std::fclose(f);
      float* dst = out + (size_t)s * h * w;
      for (int64_t i = 0; i < h * w; ++i) {
        uint16_t v = (uint16_t)((buf[2 * i] << 8) | buf[2 * i + 1]);
        dst[i] = (float)v / 65535.0f;
      }
    }
  };
  unsigned nt = std::max(1u, std::thread::hardware_concurrency());
  nt = std::min<unsigned>(nt, (unsigned)n_slices);
  std::vector<std::thread> threads;
  int per = (n_slices + nt - 1) / nt;
  for (unsigned t = 0; t < nt; ++t) {
    int b = t * per, e = std::min<int>(n_slices, b + per);
    if (b < e) threads.emplace_back(work, b, e);
  }
  for (auto& t : threads) t.join();
  for (int s : status)
    if (s) return s;
  return 0;
}

}  // extern "C"
