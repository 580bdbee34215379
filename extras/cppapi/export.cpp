// C++ export sample (reference parity: extras/cppapi/export.cpp).
//
// The TPU-native export path is AOT compilation from Python
// (odtk_tpu.export.export_cpp_engine) because lowering requires the
// JAX tracer. This sample covers the other half of the reference
// export.cpp: validating an engine file and printing its deployment
// contract (sizes, batch profile, anchor configuration) — the checks a
// deployment pipeline runs before shipping an engine.
//
// Usage: export engine.cppengine

#include <cstdio>
#include <string>

#include "odtk_pjrt.h"

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s engine.cppengine\n", argv[0]);
    fprintf(stderr,
            "create engines with: odtk-tpu export model.ckpt out.cppengine "
            "(or odtk_tpu.export.export_cpp_engine)\n");
    return 1;
  }
  std::ifstream f(argv[1], std::ios::binary);
  if (!f) {
    fprintf(stderr, "cannot open %s\n", argv[1]);
    return 1;
  }
  char magic[8];
  f.read(magic, 8);
  if (std::memcmp(magic, "ODTKCPP1", 8) != 0) {
    fprintf(stderr, "%s: bad magic\n", argv[1]);
    return 1;
  }
  uint32_t meta_len;
  f.read(reinterpret_cast<char*>(&meta_len), 4);
  std::string meta(meta_len, 0);
  f.read(meta.data(), meta_len);
  uint64_t prog_len;
  f.read(reinterpret_cast<char*>(&prog_len), 8);

  printf("engine:     %s\n", argv[1]);
  printf("meta:       %s\n", meta.c_str());
  printf("stablehlo:  %.1f MB\n", prog_len / 1e6);
  printf("input:      float32 NHWC [%s, %s, %s, 3], RGB/255 "
         "ImageNet-normalized\n",
         odtk::JsonField(meta, "batch").c_str(),
         odtk::JsonField(meta, "height").c_str(),
         odtk::JsonField(meta, "width").c_str());
  printf("outputs:    scores [%s], boxes [%s x %s], classes\n",
         odtk::JsonField(meta, "detections").c_str(),
         odtk::JsonField(meta, "detections").c_str(),
         odtk::JsonField(meta, "box_dim").c_str());
  return 0;
}
