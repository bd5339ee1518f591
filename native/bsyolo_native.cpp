// bsyolo_tpu native runtime support library.
//
// TPU-native counterpart of the reference's C++ inference examples
// (reference examples/YOLOv8-CPP-Inference/inference.cpp,
// YOLOv8-LibTorch-CPP-Inference/main.cc, YOLOv8-ONNXRuntime-Rust/src/*):
// the host-side pre/post-processing a C++ serving client needs around an
// exported model artifact — letterbox, NMS, box rescaling — exposed behind a
// C ABI so the Python framework (ctypes) and standalone clients share one
// implementation.
//
// Build: make -C native   (produces libbsyolo_native.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Bilinear resize (uint8 HWC) + letterbox pad, matching the Python
// letterbox_image semantics (center pad with round-0.1 split, pad value 114).
// dst must hold dst_h * dst_w * ch bytes. Returns the scale ratio.
float bsy_letterbox(const uint8_t* src, int src_h, int src_w, int ch,
                    uint8_t* dst, int dst_h, int dst_w, uint8_t pad_value) {
  float r = std::min((float)dst_h / src_h, (float)dst_w / src_w);
  int new_w = (int)std::lround(src_w * r);
  int new_h = (int)std::lround(src_h * r);
  float dw = (dst_w - new_w) / 2.0f;
  float dh = (dst_h - new_h) / 2.0f;
  int top = (int)std::lround(dh - 0.1);
  int left = (int)std::lround(dw - 0.1);

  std::memset(dst, pad_value, (size_t)dst_h * dst_w * ch);

  // bilinear resize with half-pixel centers (cv2 INTER_LINEAR geometry)
  float sx = (float)src_w / new_w;
  float sy = (float)src_h / new_h;
  for (int y = 0; y < new_h; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = (int)std::floor(fy);
    float wy = fy - y0;
    int y0c = std::min(std::max(y0, 0), src_h - 1);
    int y1c = std::min(std::max(y0 + 1, 0), src_h - 1);
    int oy = y + top;
    if (oy < 0 || oy >= dst_h) continue;
    for (int x = 0; x < new_w; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = (int)std::floor(fx);
      float wx = fx - x0;
      int x0c = std::min(std::max(x0, 0), src_w - 1);
      int x1c = std::min(std::max(x0 + 1, 0), src_w - 1);
      int ox = x + left;
      if (ox < 0 || ox >= dst_w) continue;
      const uint8_t* p00 = src + ((size_t)y0c * src_w + x0c) * ch;
      const uint8_t* p01 = src + ((size_t)y0c * src_w + x1c) * ch;
      const uint8_t* p10 = src + ((size_t)y1c * src_w + x0c) * ch;
      const uint8_t* p11 = src + ((size_t)y1c * src_w + x1c) * ch;
      uint8_t* q = dst + ((size_t)oy * dst_w + ox) * ch;
      for (int c = 0; c < ch; ++c) {
        float v = p00[c] * (1 - wx) * (1 - wy) + p01[c] * wx * (1 - wy) +
                  p10[c] * (1 - wx) * wy + p11[c] * wx * wy;
        q[c] = (uint8_t)std::lround(std::min(std::max(v, 0.0f), 255.0f));
      }
    }
  }
  return r;
}

static inline float iou_xyxy(const float* a, const float* b) {
  float x1 = std::max(a[0], b[0]);
  float y1 = std::max(a[1], b[1]);
  float x2 = std::min(a[2], b[2]);
  float y2 = std::min(a[3], b[3]);
  float inter = std::max(0.0f, x2 - x1) * std::max(0.0f, y2 - y1);
  float ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter;
  return ua > 0 ? inter / ua : 0.0f;
}

// Greedy class-aware NMS over decoded predictions.
// preds: n rows of [cx, cy, w, h, score_0..score_{nc-1}] (the exported model
// output layout). Writes up to max_det rows of [x1,y1,x2,y2,conf,cls] to out.
// Returns the number of detections written.
int bsy_nms(const float* preds, int n, int nc, float conf_thres,
            float iou_thres, int max_det, float* out) {
  struct Cand { float box[4]; float conf; int cls; };
  std::vector<Cand> cands;
  cands.reserve(256);
  for (int i = 0; i < n; ++i) {
    const float* row = preds + (size_t)i * (4 + nc);
    for (int c = 0; c < nc; ++c) {
      float s = row[4 + c];
      if (s > conf_thres) {
        Cand cd;
        cd.box[0] = row[0] - row[2] / 2;
        cd.box[1] = row[1] - row[3] / 2;
        cd.box[2] = row[0] + row[2] / 2;
        cd.box[3] = row[1] + row[3] / 2;
        cd.conf = s;
        cd.cls = c;
        cands.push_back(cd);
      }
    }
  }
  std::stable_sort(cands.begin(), cands.end(),
                   [](const Cand& a, const Cand& b) { return a.conf > b.conf; });
  std::vector<char> removed(cands.size(), 0);
  int m = 0;
  for (size_t i = 0; i < cands.size() && m < max_det; ++i) {
    if (removed[i]) continue;
    const Cand& a = cands[i];
    float* o = out + (size_t)m * 6;
    o[0] = a.box[0]; o[1] = a.box[1]; o[2] = a.box[2]; o[3] = a.box[3];
    o[4] = a.conf; o[5] = (float)a.cls;
    ++m;
    for (size_t j = i + 1; j < cands.size(); ++j) {
      if (removed[j] || cands[j].cls != a.cls) continue;
      if (iou_xyxy(a.box, cands[j].box) > iou_thres) removed[j] = 1;
    }
  }
  return m;
}

// Rescale letterboxed xyxy boxes back to the original image (reference
// utils/ops.py:92 scale_boxes). boxes: n x 6 rows, modified in place.
void bsy_scale_boxes(float* boxes, int n, int lb_h, int lb_w, int orig_h,
                     int orig_w) {
  float gain = std::min((float)lb_h / orig_h, (float)lb_w / orig_w);
  float pad_w = std::lround((lb_w - orig_w * gain) / 2.0f - 0.1f);
  float pad_h = std::lround((lb_h - orig_h * gain) / 2.0f - 0.1f);
  for (int i = 0; i < n; ++i) {
    float* b = boxes + (size_t)i * 6;
    b[0] = std::min(std::max((b[0] - pad_w) / gain, 0.0f), (float)orig_w);
    b[1] = std::min(std::max((b[1] - pad_h) / gain, 0.0f), (float)orig_h);
    b[2] = std::min(std::max((b[2] - pad_w) / gain, 0.0f), (float)orig_w);
    b[3] = std::min(std::max((b[3] - pad_h) / gain, 0.0f), (float)orig_h);
  }
}

// uint8 HWC -> float32 NHWC [0,1] with BGR->RGB swap (predict preprocessing).
void bsy_normalize(const uint8_t* src, int h, int w, float* dst) {
  for (int i = 0; i < h * w; ++i) {
    const uint8_t* p = src + (size_t)i * 3;
    float* q = dst + (size_t)i * 3;
    q[0] = p[2] / 255.0f;
    q[1] = p[1] / 255.0f;
    q[2] = p[0] / 255.0f;
  }
}

}  // extern "C"
