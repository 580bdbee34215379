// C++ image-inference sample (reference parity: extras/cppapi/infer.cpp).
//
// Usage: infer engine.cppengine image.jpg [output.png] [plugin.so]
//
// Loads an AOT engine, preprocesses one image with OpenCV (resize to
// the engine input, RGB /255, ImageNet mean/std), runs a 100-iteration
// latency benchmark, draws boxes with score >= 0.3 and writes the
// annotated image.

#include <chrono>
#include <cstdio>
#include <string>
#include <vector>

#include <opencv2/opencv.hpp>

#include "odtk_pjrt.h"

int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr,
            "usage: %s engine.cppengine image.jpg [out.png] [plugin.so]\n",
            argv[0]);
    return 1;
  }
  std::string engine_path = argv[1];
  std::string image_path = argv[2];
  std::string out_path = argc > 3 ? argv[3] : "detections.png";
  std::string plugin = argc > 4 ? argv[4] : "/opt/axon/libaxon_pjrt.so";

  odtk::Runtime rt(plugin);
  printf("Loading engine %s...\n", engine_path.c_str());
  odtk::Engine engine(&rt, engine_path);
  int H = engine.height(), W = engine.width();
  printf("engine: %dx%d batch=%d detections=%d\n", H, W, engine.max_batch(),
         engine.max_detections());

  cv::Mat bgr = cv::imread(image_path);
  if (bgr.empty()) {
    fprintf(stderr, "cannot read %s\n", image_path.c_str());
    return 1;
  }
  // aspect-preserving resize into the engine canvas
  float ratio = std::min(static_cast<float>(W) / bgr.cols,
                         static_cast<float>(H) / bgr.rows);
  cv::Mat resized;
  cv::resize(bgr, resized, cv::Size(bgr.cols * ratio, bgr.rows * ratio));
  cv::Mat rgb;
  cv::cvtColor(resized, rgb, cv::COLOR_BGR2RGB);

  // u8 engines take raw letterboxed bytes (normalize runs in-graph,
  // 4x fewer host->device bytes); f32 engines keep the classic path
  std::vector<float> input(engine.max_batch() * H * W * 3, 0.0f);
  std::vector<uint8_t> input8(engine.max_batch() * H * W * 3, 0);
  if (engine.input_u8())
    odtk::PreprocessU8(rgb.data, rgb.rows, rgb.cols, input8.data(), H, W);
  else
    odtk::Preprocess(rgb.data, rgb.rows, rgb.cols, input.data(), H, W);
  auto run = [&]() {
    return engine.input_u8() ? engine.Infer(input8.data())
                             : engine.Infer(input.data());
  };

  printf("Warmup...\n");
  odtk::Detections det = run();

  const int iters = 100;
  auto t0 = std::chrono::steady_clock::now();
  for (int i = 0; i < iters; ++i) det = run();
  auto dt = std::chrono::duration<double>(std::chrono::steady_clock::now() -
                                          t0).count();
  printf("Took %.3f ms per inference (incl. host I/O roundtrip)\n",
         dt / iters * 1e3);

  int drawn = 0;
  for (int i = 0; i < engine.max_detections(); ++i) {
    float score = det.scores[i];
    if (score < 0.3f) continue;
    const float* b = &det.boxes[i * engine.box_dim()];
    float x1 = b[0] / ratio, y1 = b[1] / ratio;
    float x2 = b[2] / ratio, y2 = b[3] / ratio;
    printf("det %d: class=%d score=%.3f box=(%.1f, %.1f, %.1f, %.1f)\n", i,
           static_cast<int>(det.classes[i]), score, x1, y1, x2, y2);
    cv::rectangle(bgr, cv::Point(x1, y1), cv::Point(x2, y2),
                  cv::Scalar(0, 255, 0), 2);
    cv::putText(bgr, cv::format("%d:%.2f",
                                static_cast<int>(det.classes[i]), score),
                cv::Point(x1 + 2, y1 + 14), cv::FONT_HERSHEY_SIMPLEX, 0.45,
                cv::Scalar(0, 255, 0), 1);
    ++drawn;
  }
  cv::imwrite(out_path, bgr);
  printf("wrote %s (%d detections >= 0.3)\n", out_path.c_str(), drawn);
  return 0;
}
