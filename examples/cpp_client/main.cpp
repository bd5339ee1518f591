// Standalone C++ detection client that EXECUTES the exported model
// (reference examples/YOLOv8-CPP-Inference/inference.cpp capability: a real
// inference session, not precomputed outputs).
//
// Pipeline: read PPM -> native letterbox + normalize (libbsyolo_native) ->
// TensorFlow C API session over the SavedModel exported by
// `yolo-tpu export format=saved_model` (bsyolo_tpu/engine/exporter.py) ->
// native NMS -> scale boxes to original pixels -> print detections.
//
// Usage: ./client image.ppm saved_model_dir [conf] [iou]
// Build: make -C native client  (links libtensorflow_cc from the venv)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "tensorflow/c/c_api.h"

extern "C" {
float bsy_letterbox(const uint8_t*, int, int, int, uint8_t*, int, int, uint8_t);
int bsy_nms(const float*, int, int, float, float, int, float*);
void bsy_scale_boxes(float*, int, int, int, int, int);
void bsy_normalize(const uint8_t*, int, int, float*);
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
  fgetc(f);
  data.resize((size_t)w * h * 3);
  size_t got = fread(data.data(), 1, data.size(), f);
  fclose(f);
  return got == data.size();
}

static void check(TF_Status* s, const char* what) {
  if (TF_GetCode(s) != TF_OK) {
    fprintf(stderr, "%s: %s\n", what, TF_Message(s));
    exit(1);
  }
}

// jax2tf SavedModels expose one serving signature; its graph I/O follow the
// standard naming: input placeholder "serving_default_<arg>" and output
// "StatefulPartitionedCall". Scan the graph for them instead of parsing the
// MetaGraphDef protobuf.
static TF_Operation* find_op(TF_Graph* graph, const char* prefix, bool want_placeholder) {
  size_t pos = 0;
  TF_Operation* op;
  TF_Operation* prefix_match = nullptr;
  while ((op = TF_GraphNextOperation(graph, &pos)) != nullptr) {
    const char* name = TF_OperationName(op);
    const char* type = TF_OperationOpType(op);
    if (strcmp(name, prefix) == 0) return op;  // exact name wins (the serving
                                               // call; saver ops get _1/_2)
    if (strncmp(name, prefix, strlen(prefix)) == 0) {
      if (want_placeholder && strcmp(type, "Placeholder") != 0) continue;
      if (!prefix_match) prefix_match = op;
    }
  }
  return prefix_match;
}

int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr, "usage: %s image.ppm saved_model_dir [conf] [iou]\n", argv[0]);
    return 2;
  }
  const char* img_path = argv[1];
  const char* model_dir = argv[2];
  float conf = argc > 3 ? (float)atof(argv[3]) : 0.25f;
  float iou = argc > 4 ? (float)atof(argv[4]) : 0.7f;

  int w = 0, h = 0;
  std::vector<uint8_t> img;
  if (!read_ppm(img_path, img, w, h)) {
    fprintf(stderr, "cannot read PPM %s\n", img_path);
    return 1;
  }

  // --- load the SavedModel session -----------------------------------
  TF_Status* status = TF_NewStatus();
  TF_Graph* graph = TF_NewGraph();
  TF_SessionOptions* opts = TF_NewSessionOptions();
  const char* tags[] = {"serve"};
  TF_Session* session = TF_LoadSessionFromSavedModel(
      opts, nullptr, model_dir, tags, 1, graph, nullptr, status);
  check(status, "load SavedModel");

  TF_Operation* in_op = find_op(graph, "serving_default", /*placeholder=*/true);
  TF_Operation* out_op = find_op(graph, "StatefulPartitionedCall", false);
  if (!in_op || !out_op) {
    fprintf(stderr, "cannot locate serving signature ops in graph\n");
    return 1;
  }

  // --- model input geometry from the placeholder shape ---------------
  TF_Output in_out{in_op, 0};
  int ndims = TF_GraphGetTensorNumDims(graph, in_out, status);
  check(status, "input dims");
  std::vector<int64_t> dims(ndims);
  TF_GraphGetTensorShape(graph, in_out, dims.data(), ndims, status);
  check(status, "input shape");
  const int imgsz = (int)dims[1];  // (B, H, W, 3)

  // --- preprocess -----------------------------------------------------
  std::vector<uint8_t> lb((size_t)imgsz * imgsz * 3);
  bsy_letterbox(img.data(), h, w, 3, lb.data(), imgsz, imgsz, 114);
  TF_Tensor* in_tensor = TF_AllocateTensor(
      TF_FLOAT, dims.data(), ndims, sizeof(float) * imgsz * imgsz * 3);
  bsy_normalize(lb.data(), imgsz, imgsz, (float*)TF_TensorData(in_tensor));

  // --- run ------------------------------------------------------------
  TF_Output out_out{out_op, 0};
  TF_Tensor* out_tensor = nullptr;
  TF_SessionRun(session, nullptr, &in_out, &in_tensor, 1, &out_out, &out_tensor, 1,
                nullptr, 0, nullptr, status);
  check(status, "session run");

  int out_nd = TF_NumDims(out_tensor);
  if (out_nd != 3) {
    fprintf(stderr, "unexpected output rank %d (want (B, anchors, 4+nc))\n", out_nd);
    return 1;
  }
  const int n_anchors = (int)TF_Dim(out_tensor, 1);
  const int nc = (int)TF_Dim(out_tensor, 2) - 4;
  const float* preds = (const float*)TF_TensorData(out_tensor);

  // --- postprocess ----------------------------------------------------
  const int max_det = 300;
  std::vector<float> dets((size_t)max_det * 6);
  int n = bsy_nms(preds, n_anchors, nc, conf, iou, max_det, dets.data());
  bsy_scale_boxes(dets.data(), n, imgsz, imgsz, h, w);

  printf("%d detections (%dx%d image, model %d, %d classes)\n", n, w, h, imgsz, nc);
  for (int i = 0; i < n; i++) {
    const float* d = &dets[(size_t)i * 6];
    printf("box %.1f %.1f %.1f %.1f conf %.4f cls %d\n", d[0], d[1], d[2], d[3], d[4],
           (int)d[5]);
  }

  TF_DeleteTensor(in_tensor);
  TF_DeleteTensor(out_tensor);
  TF_DeleteSession(session, status);
  TF_DeleteSessionOptions(opts);
  TF_DeleteGraph(graph);
  TF_DeleteStatus(status);
  return 0;
}
