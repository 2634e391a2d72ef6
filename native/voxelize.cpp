// Mesh inside-test via +z ray parity — the native counterpart of
// sph_project_tpu/geometry/mesh.py:inside_lattice, for big meshes at scene
// build time (the reference leans on trimesh's compiled voxelizer,
// base_container.py:635-638; this replaces it without the dependency).
//
// C ABI for ctypes. Built into libsphnative.so (see Makefile).

#include <cstdint>
#include <cmath>
#include <vector>

extern "C" {

// For each query point, count triangle crossings below it along +z and
// return inside = (crossings % 2 == 1).
void mesh_inside(
    const double* verts, int64_t n_verts,
    const int64_t* faces, int64_t n_faces,
    const double* points, int64_t n_points,
    uint8_t* out_inside)
{
    (void)n_verts;
    // bin points into an xy-grid sized by the median triangle extent
    double minx = 1e300, miny = 1e300, maxx = -1e300, maxy = -1e300;
    for (int64_t p = 0; p < n_points; ++p) {
        minx = std::fmin(minx, points[3 * p]);
        maxx = std::fmax(maxx, points[3 * p]);
        miny = std::fmin(miny, points[3 * p + 1]);
        maxy = std::fmax(maxy, points[3 * p + 1]);
    }
    double ext_sum = 0;
    for (int64_t f = 0; f < n_faces; ++f) {
        const double* a = verts + 3 * faces[3 * f];
        const double* b = verts + 3 * faces[3 * f + 1];
        const double* c = verts + 3 * faces[3 * f + 2];
        double ex = std::fmax(a[0], std::fmax(b[0], c[0])) -
                    std::fmin(a[0], std::fmin(b[0], c[0]));
        double ey = std::fmax(a[1], std::fmax(b[1], c[1])) -
                    std::fmin(a[1], std::fmin(b[1], c[1]));
        ext_sum += std::fmax(ex, ey);
    }
    double cell = n_faces ? std::fmax(ext_sum / n_faces, 1e-9) : 1.0;
    int nx = (int)((maxx - minx) / cell) + 1;
    int ny = (int)((maxy - miny) / cell) + 1;
    if (nx < 1) nx = 1;
    if (ny < 1) ny = 1;

    std::vector<std::vector<int64_t>> bins((size_t)nx * ny);
    for (int64_t p = 0; p < n_points; ++p) {
        int bx = (int)((points[3 * p] - minx) / cell);
        int by = (int)((points[3 * p + 1] - miny) / cell);
        if (bx < 0) bx = 0; if (bx >= nx) bx = nx - 1;
        if (by < 0) by = 0; if (by >= ny) by = ny - 1;
        bins[(size_t)bx * ny + by].push_back(p);
    }

    std::vector<int32_t> crossings(n_points, 0);
    for (int64_t f = 0; f < n_faces; ++f) {
        const double* A = verts + 3 * faces[3 * f];
        const double* B = verts + 3 * faces[3 * f + 1];
        const double* C = verts + 3 * faces[3 * f + 2];
        const double e1x = B[0] - A[0], e1y = B[1] - A[1], e1z = B[2] - A[2];
        const double e2x = C[0] - A[0], e2y = C[1] - A[1], e2z = C[2] - A[2];
        const double denom = e1x * e2y - e1y * e2x;
        if (std::fabs(denom) < 1e-15) continue;
        const double inv = 1.0 / denom;
        double tminx = std::fmin(A[0], std::fmin(B[0], C[0]));
        double tmaxx = std::fmax(A[0], std::fmax(B[0], C[0]));
        double tminy = std::fmin(A[1], std::fmin(B[1], C[1]));
        double tmaxy = std::fmax(A[1], std::fmax(B[1], C[1]));
        int bx0 = (int)((tminx - minx) / cell), bx1 = (int)((tmaxx - minx) / cell);
        int by0 = (int)((tminy - miny) / cell), by1 = (int)((tmaxy - miny) / cell);
        if (bx0 < 0) bx0 = 0; if (bx1 >= nx) bx1 = nx - 1;
        if (by0 < 0) by0 = 0; if (by1 >= ny) by1 = ny - 1;
        for (int bx = bx0; bx <= bx1; ++bx) {
            for (int by = by0; by <= by1; ++by) {
                for (int64_t p : bins[(size_t)bx * ny + by]) {
                    const double dx = points[3 * p] - A[0];
                    const double dy = points[3 * p + 1] - A[1];
                    const double s = (dx * e2y - dy * e2x) * inv;
                    const double t = (e1x * dy - e1y * dx) * inv;
                    if (s < 0 || t < 0 || s + t > 1) continue;
                    const double zc = A[2] + s * e1z + t * e2z;
                    if (zc < points[3 * p + 2]) crossings[p]++;
                }
            }
        }
    }
    for (int64_t p = 0; p < n_points; ++p)
        out_inside[p] = (uint8_t)(crossings[p] & 1);
}

}  // extern "C"
