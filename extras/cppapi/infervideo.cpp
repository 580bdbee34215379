// C++ video-inference sample (reference parity: extras/cppapi/infervideo.cpp
// and the DeepStream pipeline role).
//
// Usage: infervideo engine.cppengine input.mp4 output.mp4 [plugin.so]
//
// Frame loop: VideoCapture -> preprocess -> engine -> draw -> VideoWriter.

#include <cstdio>
#include <string>
#include <vector>

#include <opencv2/opencv.hpp>

#include "odtk_pjrt.h"

int main(int argc, char** argv) {
  if (argc < 4) {
    fprintf(stderr, "usage: %s engine.cppengine in.mp4 out.mp4 [plugin.so]\n",
            argv[0]);
    return 1;
  }
  std::string plugin = argc > 4 ? argv[4] : "/opt/axon/libaxon_pjrt.so";
  odtk::Runtime rt(plugin);
  odtk::Engine engine(&rt, argv[1]);
  int H = engine.height(), W = engine.width();

  cv::VideoCapture src(argv[2]);
  if (!src.isOpened()) {
    fprintf(stderr, "cannot open %s\n", argv[2]);
    return 1;
  }
  cv::Mat frame;
  src >> frame;
  if (frame.empty()) return 1;

  cv::VideoWriter sink(argv[3], cv::VideoWriter::fourcc('M', 'P', '4', 'V'),
                       src.get(cv::CAP_PROP_FPS),
                       cv::Size(frame.cols, frame.rows));
  float ratio = std::min(static_cast<float>(W) / frame.cols,
                         static_cast<float>(H) / frame.rows);
  std::vector<float> input(engine.max_batch() * H * W * 3, 0.0f);
  std::vector<uint8_t> input8(engine.max_batch() * H * W * 3, 0);

  int frames = 0;
  while (!frame.empty()) {
    cv::Mat resized, rgb;
    cv::resize(frame, resized,
               cv::Size(frame.cols * ratio, frame.rows * ratio));
    cv::cvtColor(resized, rgb, cv::COLOR_BGR2RGB);
    odtk::Detections det;
    if (engine.input_u8()) {
      odtk::PreprocessU8(rgb.data, rgb.rows, rgb.cols, input8.data(), H, W);
      det = engine.Infer(input8.data());
    } else {
      odtk::Preprocess(rgb.data, rgb.rows, rgb.cols, input.data(), H, W);
      det = engine.Infer(input.data());
    }
    for (int i = 0; i < engine.max_detections(); ++i) {
      if (det.scores[i] < 0.3f) continue;
      const float* b = &det.boxes[i * engine.box_dim()];
      cv::rectangle(frame, cv::Point(b[0] / ratio, b[1] / ratio),
                    cv::Point(b[2] / ratio, b[3] / ratio),
                    cv::Scalar(0, 255, 0), 2);
    }
    sink << frame;
    ++frames;
    src >> frame;
  }
  printf("processed %d frames -> %s\n", frames, argv[3]);
  return 0;
}
