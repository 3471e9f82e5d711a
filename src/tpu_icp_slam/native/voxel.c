/* Native host-side preprocessing (SURVEY.md §1b: the reference's C++ host
 * tier maps to native code where it is genuinely hot; device compute is
 * Pallas/XLA). First-point-per-voxel downsampling is the per-scan host cost
 * of the "Velodyne downsampled" step (BASELINE.json config 4): the NumPy
 * path sorts all quantized keys (O(N log N) + several temporaries); this is
 * one linear pass over an open-addressing hash table.
 *
 * API (ctypes, see native/__init__.py):
 *   long voxel_downsample_f64(const double* pts, long n, int dim,
 *                             double voxel, long* out_idx)
 * returns the number of kept indices written to out_idx (first point of
 * each voxel, in scan order — matching core.pointcloud.voxel_downsample_np).
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

static inline uint64_t hash3(int64_t x, int64_t y, int64_t z) {
    uint64_t h = (uint64_t)x * 73856093ULL;
    h ^= (uint64_t)y * 19349669ULL;
    h ^= (uint64_t)z * 83492791ULL;
    /* finalize (splitmix64 tail) so clustered voxel ids spread */
    h ^= h >> 30; h *= 0xbf58476d1ce4e5b9ULL;
    h ^= h >> 27; h *= 0x94d049bb133111ebULL;
    h ^= h >> 31;
    return h;
}

long voxel_downsample_f64(const double* pts, long n, int dim,
                          double voxel, long* out_idx) {
    if (n <= 0 || voxel <= 0.0 || dim < 2 || dim > 3) return 0;
    /* table sized to next power of two >= 2n (load factor <= 0.5) */
    uint64_t cap = 1;
    while ((long)cap < 2 * n) cap <<= 1;
    /* slots hold (key material + occupied flag); store quantized coords to
     * resolve hash collisions exactly */
    int64_t* kx = (int64_t*)malloc(cap * sizeof(int64_t));
    int64_t* ky = (int64_t*)malloc(cap * sizeof(int64_t));
    int64_t* kz = (int64_t*)malloc(cap * sizeof(int64_t));
    uint8_t* occ = (uint8_t*)calloc(cap, 1);
    if (!kx || !ky || !kz || !occ) {
        free(kx); free(ky); free(kz); free(occ);
        return -1;
    }
    const uint64_t mask = cap - 1;
    long kept = 0;
    for (long i = 0; i < n; i++) {
        const double* p = pts + (size_t)i * dim;
        int64_t qx = (int64_t)floor(p[0] / voxel);
        int64_t qy = (int64_t)floor(p[1] / voxel);
        int64_t qz = dim == 3 ? (int64_t)floor(p[2] / voxel) : 0;
        uint64_t slot = hash3(qx, qy, qz) & mask;
        int is_new = 0;
        for (;;) {
            if (!occ[slot]) {
                occ[slot] = 1;
                kx[slot] = qx; ky[slot] = qy; kz[slot] = qz;
                is_new = 1;
                break;
            }
            if (kx[slot] == qx && ky[slot] == qy && kz[slot] == qz) break;
            slot = (slot + 1) & mask;
        }
        if (is_new) out_idx[kept++] = i;
    }
    free(kx); free(ky); free(kz); free(occ);
    return kept;
}

/* Polar 2D scan -> Cartesian hit points (the CARMEN/.clf hot path).
 * Writes up to n (x, y) pairs for beams with range < max_range * 0.999;
 * returns the number of hits. */
long polar_to_cartesian_f64(const double* ranges, const double* angles,
                            long n, double max_range, double* out_xy) {
    long k = 0;
    double lim = max_range * 0.999;
    for (long i = 0; i < n; i++) {
        double r = ranges[i];
        if (r < lim) {
            out_xy[2 * k] = r * cos(angles[i]);
            out_xy[2 * k + 1] = r * sin(angles[i]);
            k++;
        }
    }
    return k;
}
