// Native mask ops (the TPU-native analogue of the reference's
// csrc mask kernels / pycocotools C: layers/csrc + mask_ops.py hot path).
// paste_masks: inverse-bilinear paste of (n, m, m) box-space mask
// probabilities into (n, H, W) image-space byte masks, evaluating only the
// pixels whose centers fall inside each box — the python mirror
// (evaluation/masks.py paste_masks_np) evaluates the full H x W grid per
// instance. Exact same math: pixel centers at +0.5, coords clipped into
// [0, m-1], bilinear, v > threshold.
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" void paste_masks(
    long long n, long long m, long long H, long long W,
    const float* masks,      // (n, m, m)
    const double* boxes,     // (n, 4) XYXY image coords
    double threshold,
    unsigned char* out)      // (n, H, W), pre-zeroed by the caller
{
  for (long long k = 0; k < n; ++k) {
    const float* mk = masks + k * m * m;
    unsigned char* o = out + k * H * W;
    const double x1 = boxes[4 * k], y1 = boxes[4 * k + 1];
    const double x2 = boxes[4 * k + 2], y2 = boxes[4 * k + 3];
    const double w = std::max(x2 - x1, 1e-3);
    const double h = std::max(y2 - y1, 1e-3);
    const long long i0 = std::max(0LL, (long long)std::ceil(y1 - 0.5));
    const long long i1 = std::min(H - 1, (long long)std::floor(y2 - 0.5));
    const long long j0 = std::max(0LL, (long long)std::ceil(x1 - 0.5));
    const long long j1 = std::min(W - 1, (long long)std::floor(x2 - 0.5));
    for (long long i = i0; i <= i1; ++i) {
      const double ys = ((i + 0.5) - y1) / h * m - 0.5;
      const double yy = std::min(std::max(ys, 0.0), (double)(m - 1));
      const long long r0 = (long long)std::floor(yy);
      const long long r1 = std::min(r0 + 1, m - 1);
      const double ly = yy - (double)r0;
      const float* row0 = mk + r0 * m;
      const float* row1 = mk + r1 * m;
      for (long long j = j0; j <= j1; ++j) {
        const double xs = ((j + 0.5) - x1) / w * m - 0.5;
        const double xx = std::min(std::max(xs, 0.0), (double)(m - 1));
        const long long c0 = (long long)std::floor(xx);
        const long long c1 = std::min(c0 + 1, m - 1);
        const double lx = xx - (double)c0;
        const double v = row0[c0] * (1 - ly) * (1 - lx) + row0[c1] * (1 - ly) * lx
                       + row1[c0] * ly * (1 - lx) + row1[c1] * ly * lx;
        o[i * W + j] = v > threshold;
      }
    }
  }
}
