// Standalone C++ detection client (reference examples/YOLOv8-CPP-Inference
// equivalent for the TPU framework's exported artifacts).
//
// Pipeline: read a PPM image -> native letterbox -> [model forward happens in
// the serving runtime via the exported StableHLO artifact; this demo reads
// its raw output from a .bin file] -> native NMS -> scale boxes -> print.
//
// Usage: ./client image.ppm preds.bin <n_anchors> <nc> [conf] [iou]
//   preds.bin: float32 (n_anchors, 4+nc) rows of cx,cy,w,h,score...
//              (exactly the exported model's output; see
//              bsyolo_tpu/engine/exporter.py metadata)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
float bsy_letterbox(const uint8_t*, int, int, int, uint8_t*, int, int, uint8_t);
int bsy_nms(const float*, int, int, float, float, int, float*);
void bsy_scale_boxes(float*, int, int, int, int, int);
}

static bool read_ppm(const char* path, std::vector<uint8_t>& data, int& w, int& h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  char magic[3] = {0};
  int maxv = 0;
  if (fscanf(f, "%2s %d %d %d", magic, &w, &h, &maxv) != 4 || strcmp(magic, "P6")) {
    fclose(f);
    return false;
  }
  fgetc(f);  // single whitespace after header
  data.resize((size_t)w * h * 3);
  size_t got = fread(data.data(), 1, data.size(), f);
  fclose(f);
  return got == data.size();
}

int main(int argc, char** argv) {
  if (argc < 5) {
    fprintf(stderr, "usage: %s image.ppm preds.bin n_anchors nc [conf] [iou]\n", argv[0]);
    return 2;
  }
  const char* img_path = argv[1];
  const char* preds_path = argv[2];
  int n_anchors = atoi(argv[3]);
  int nc = atoi(argv[4]);
  float conf = argc > 5 ? atof(argv[5]) : 0.25f;
  float iou = argc > 6 ? atof(argv[6]) : 0.7f;

  int w = 0, h = 0;
  std::vector<uint8_t> img;
  if (!read_ppm(img_path, img, w, h)) {
    fprintf(stderr, "cannot read PPM %s\n", img_path);
    return 1;
  }
  const int imgsz = 640;
  std::vector<uint8_t> lb((size_t)imgsz * imgsz * 3);
  bsy_letterbox(img.data(), h, w, 3, lb.data(), imgsz, imgsz, 114);
  printf("letterboxed %dx%d -> %dx%d\n", w, h, imgsz, imgsz);

  FILE* f = fopen(preds_path, "rb");
  if (!f) {
    fprintf(stderr, "cannot read preds %s\n", preds_path);
    return 1;
  }
  std::vector<float> preds((size_t)n_anchors * (4 + nc));
  size_t got = fread(preds.data(), sizeof(float), preds.size(), f);
  fclose(f);
  if (got != preds.size()) {
    fprintf(stderr, "short read: %zu of %zu floats\n", got, preds.size());
    return 1;
  }

  std::vector<float> out((size_t)300 * 6);
  int m = bsy_nms(preds.data(), n_anchors, nc, conf, iou, 300, out.data());
  bsy_scale_boxes(out.data(), m, imgsz, imgsz, h, w);
  printf("%d detections\n", m);
  for (int i = 0; i < m; ++i) {
    const float* b = out.data() + (size_t)i * 6;
    printf("box %.1f %.1f %.1f %.1f conf %.3f cls %d\n", b[0], b[1], b[2], b[3], b[4], (int)b[5]);
  }
  return 0;
}
