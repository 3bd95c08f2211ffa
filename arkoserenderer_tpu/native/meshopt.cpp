// Native asset-pipeline kernels: meshlet building + block texture compression.
//
// Role-equivalent to the reference's vendored meshoptimizer (MeshAsset::
// generateMeshlets, arkcore/asset/MeshAsset.cpp) and TextureCompressor
// (arkcore/asset/TextureCompressor.cpp:57-79 — BC5/BC7 via rgbcx /
// bc7enc_rdo): written from scratch for this framework's bake pipeline.
// Exposed as a C ABI for ctypes; Python fallbacks exist for environments
// without a compiler (assets/meshopt.py).
//
// Build: g++ -O2 -shared -fPIC meshopt.cpp -o libarkmeshopt.so

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <unordered_set>

extern "C" {

// Greedy meshlet scan: walk triangles in submission order, cutting a new
// meshlet when the unique-vertex or triangle budget would overflow.
// Outputs per meshlet: [tri_offset, tri_count] and bounds
// [cx, cy, cz, radius, cone_x, cone_y, cone_z, cone_cutoff].
// Returns the number of meshlets (<= num_tris).
int32_t ark_build_meshlets(
    const float* positions,     // V * 3
    const int32_t* indices,     // T * 3
    int32_t num_tris,
    int32_t max_verts,
    int32_t max_tris,
    int32_t* out_tri_offset,    // cap num_tris
    int32_t* out_tri_count,     // cap num_tris
    float* out_bounds)          // cap num_tris * 8
{
    int32_t num_meshlets = 0;
    int32_t cursor = 0;
    std::unordered_set<int32_t> verts;
    verts.reserve(max_verts * 2);

    while (cursor < num_tris) {
        int32_t start = cursor;
        verts.clear();
        while (cursor < num_tris && (cursor - start) < max_tris) {
            // Would adding this triangle overflow the vertex budget?
            int32_t added = 0;
            for (int k = 0; k < 3; ++k)
                if (!verts.count(indices[cursor * 3 + k])) ++added;
            if ((int32_t)verts.size() + added > max_verts) break;
            for (int k = 0; k < 3; ++k)
                verts.insert(indices[cursor * 3 + k]);
            ++cursor;
        }
        if (cursor == start) { // degenerate: force progress
            for (int k = 0; k < 3; ++k) verts.insert(indices[cursor * 3 + k]);
            ++cursor;
        }

        int32_t count = cursor - start;
        out_tri_offset[num_meshlets] = start;
        out_tri_count[num_meshlets] = count;

        // Bounding sphere (centroid + max distance) and normal cone.
        double cx = 0, cy = 0, cz = 0;
        double nx = 0, ny = 0, nz = 0;
        for (int32_t t = start; t < cursor; ++t) {
            const float* a = positions + indices[t * 3 + 0] * 3;
            const float* b = positions + indices[t * 3 + 1] * 3;
            const float* c = positions + indices[t * 3 + 2] * 3;
            cx += (a[0] + b[0] + c[0]) / 3.0;
            cy += (a[1] + b[1] + c[1]) / 3.0;
            cz += (a[2] + b[2] + c[2]) / 3.0;
            double e1[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
            double e2[3] = {c[0] - a[0], c[1] - a[1], c[2] - a[2]};
            double fn[3] = {
                e1[1] * e2[2] - e1[2] * e2[1],
                e1[2] * e2[0] - e1[0] * e2[2],
                e1[0] * e2[1] - e1[1] * e2[0],
            };
            double len = std::sqrt(fn[0] * fn[0] + fn[1] * fn[1] + fn[2] * fn[2]);
            if (len > 1e-20) { nx += fn[0] / len; ny += fn[1] / len; nz += fn[2] / len; }
        }
        cx /= count; cy /= count; cz /= count;
        double r2 = 0;
        for (int32_t t = start; t < cursor; ++t) {
            for (int k = 0; k < 3; ++k) {
                const float* p = positions + indices[t * 3 + k] * 3;
                double dx = p[0] - cx, dy = p[1] - cy, dz = p[2] - cz;
                double d2 = dx * dx + dy * dy + dz * dz;
                if (d2 > r2) r2 = d2;
            }
        }
        double nlen = std::sqrt(nx * nx + ny * ny + nz * nz);
        double ax = 0, ay = 0, az = 1, cutoff = 1.0; // cutoff 1 = cull nothing
        if (nlen > 1e-12) {
            ax = nx / nlen; ay = ny / nlen; az = nz / nlen;
            // Cone cutoff: min dot(face normal, axis) over the meshlet.
            double mind = 1.0;
            for (int32_t t = start; t < cursor; ++t) {
                const float* a = positions + indices[t * 3 + 0] * 3;
                const float* b = positions + indices[t * 3 + 1] * 3;
                const float* c = positions + indices[t * 3 + 2] * 3;
                double e1[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
                double e2[3] = {c[0] - a[0], c[1] - a[1], c[2] - a[2]};
                double fn[3] = {
                    e1[1] * e2[2] - e1[2] * e2[1],
                    e1[2] * e2[0] - e1[0] * e2[2],
                    e1[0] * e2[1] - e1[1] * e2[0],
                };
                double len = std::sqrt(fn[0]*fn[0] + fn[1]*fn[1] + fn[2]*fn[2]);
                if (len < 1e-20) continue;
                double d = (fn[0]*ax + fn[1]*ay + fn[2]*az) / len;
                if (d < mind) mind = d;
            }
            cutoff = mind;
        }
        float* bo = out_bounds + num_meshlets * 8;
        bo[0] = (float)cx; bo[1] = (float)cy; bo[2] = (float)cz;
        bo[3] = (float)std::sqrt(r2);
        bo[4] = (float)ax; bo[5] = (float)ay; bo[6] = (float)az;
        bo[7] = (float)cutoff;
        ++num_meshlets;
    }
    return num_meshlets;
}

// BC4 block compression of one channel: 4x4 blocks, 8 bytes/block
// (endpoints + 3-bit indices). Input is (H, W) uint8, H and W multiples
// of 4. Output layout: row-major blocks.
void ark_compress_bc4(
    const uint8_t* img, int32_t height, int32_t width, uint8_t* out)
{
    int bw = width / 4, bh = height / 4;
    for (int by = 0; by < bh; ++by) {
        for (int bx = 0; bx < bw; ++bx) {
            uint8_t texels[16];
            uint8_t mn = 255, mx = 0;
            for (int y = 0; y < 4; ++y)
                for (int x = 0; x < 4; ++x) {
                    uint8_t v = img[(by * 4 + y) * width + bx * 4 + x];
                    texels[y * 4 + x] = v;
                    if (v < mn) mn = v;
                    if (v > mx) mx = v;
                }
            uint8_t* blk = out + (by * bw + bx) * 8;
            blk[0] = mx;  // endpoint0 > endpoint1 selects the 8-value mode
            blk[1] = mn;
            uint64_t bits = 0;
            for (int i = 0; i < 16; ++i) {
                int code;
                if (mx == mn) {
                    code = 0;
                } else {
                    // Palette: 0->e0, 1->e1, 2..7 interpolate.
                    double t = double(texels[i] - mn) / double(mx - mn); // 0..1
                    int q = (int)std::lround(t * 7.0);                   // 0..7
                    static const int remap[8] = {1, 7, 6, 5, 4, 3, 2, 0};
                    code = remap[q];
                }
                bits |= (uint64_t)(code & 7) << (3 * i);
            }
            for (int i = 0; i < 6; ++i) blk[2 + i] = (bits >> (8 * i)) & 0xFF;
        }
    }
}

// BC5 = two independent BC4 channels (the reference's normal-map format).
void ark_compress_bc5(
    const uint8_t* r, const uint8_t* g, int32_t height, int32_t width,
    uint8_t* out)
{
    int bw = width / 4, bh = height / 4;
    std::vector<uint8_t> rblocks((size_t)bw * bh * 8), gblocks((size_t)bw * bh * 8);
    ark_compress_bc4(r, height, width, rblocks.data());
    ark_compress_bc4(g, height, width, gblocks.data());
    for (int i = 0; i < bw * bh; ++i) {
        std::memcpy(out + i * 16, rblocks.data() + i * 8, 8);
        std::memcpy(out + i * 16 + 8, gblocks.data() + i * 8, 8);
    }
}

// BC4 decode (for tests / runtime decompression).
void ark_decompress_bc4(
    const uint8_t* blocks, int32_t height, int32_t width, uint8_t* out)
{
    int bw = width / 4, bh = height / 4;
    for (int by = 0; by < bh; ++by) {
        for (int bx = 0; bx < bw; ++bx) {
            const uint8_t* blk = blocks + (by * bw + bx) * 8;
            int e0 = blk[0], e1 = blk[1];
            int pal[8];
            pal[0] = e0; pal[1] = e1;
            if (e0 > e1)
                for (int i = 1; i < 7; ++i) pal[1 + i] = ((7 - i) * e0 + i * e1) / 7;
            else {
                for (int i = 1; i < 5; ++i) pal[1 + i] = ((5 - i) * e0 + i * e1) / 5;
                pal[6] = 0; pal[7] = 255;
            }
            uint64_t bits = 0;
            for (int i = 0; i < 6; ++i) bits |= (uint64_t)blk[2 + i] << (8 * i);
            for (int i = 0; i < 16; ++i) {
                int code = (bits >> (3 * i)) & 7;
                int y = by * 4 + i / 4, x = bx * 4 + i % 4;
                out[y * width + x] = (uint8_t)pal[code];
            }
        }
    }
}

}  // extern "C"
