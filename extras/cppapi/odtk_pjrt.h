// odtk-tpu C++ inference runtime over the PJRT C API.
//
// The C++-API counterpart of the reference's odtk::Engine
// (csrc/engine.h:39-81): load an exported engine file, compile it on
// the attached TPU (PJRT plugin .so), and run batched inference.
// Unlike the TRT engine, the graph already contains decode+NMS — the
// executable's outputs are final (scores, boxes, classes).
//
// Engine container format (written by odtk_tpu.export.export_cpp_engine):
//   magic "ODTKCPP1" | u32 meta_json_len | meta json
//   | u64 prog_len | StableHLO bytecode (weights baked as constants)
//   | u64 opts_len | serialized xla CompileOptionsProto
//
// Header-only; link with -ldl.

#ifndef ODTK_PJRT_H_
#define ODTK_PJRT_H_

#include <dlfcn.h>
#include <unistd.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <stdexcept>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace odtk {

inline void Check(const PJRT_Api* api, PJRT_Error* err, const char* what) {
  if (!err) return;
  PJRT_Error_Message_Args m{PJRT_Error_Message_Args_STRUCT_SIZE, nullptr, err};
  api->PJRT_Error_Message(&m);
  std::string msg(m.message, m.message_size);
  PJRT_Error_Destroy_Args d{PJRT_Error_Destroy_Args_STRUCT_SIZE, nullptr, err};
  api->PJRT_Error_Destroy(&d);
  throw std::runtime_error(std::string(what) + ": " + msg);
}

// Minimal JSON value lookup (flat string/number fields only).
inline std::string JsonField(const std::string& js, const std::string& key) {
  auto pos = js.find("\"" + key + "\"");
  if (pos == std::string::npos) return "";
  pos = js.find(':', pos);
  auto end = js.find_first_of(",}", pos);
  std::string v = js.substr(pos + 1, end - pos - 1);
  while (!v.empty() && (v.front() == ' ' || v.front() == '"')) v.erase(0, 1);
  while (!v.empty() && (v.back() == ' ' || v.back() == '"')) v.pop_back();
  return v;
}

class Runtime {
 public:
  explicit Runtime(const std::string& plugin_path) {
    handle_ = dlopen(plugin_path.c_str(), RTLD_NOW | RTLD_GLOBAL);
    if (!handle_) throw std::runtime_error(dlerror());
    auto get = reinterpret_cast<const PJRT_Api* (*)()>(
        dlsym(handle_, "GetPjrtApi"));
    if (!get) throw std::runtime_error("plugin has no GetPjrtApi");
    api_ = get();
    PJRT_Plugin_Initialize_Args init{PJRT_Plugin_Initialize_Args_STRUCT_SIZE,
                                     nullptr};
    Check(api_, api_->PJRT_Plugin_Initialize(&init), "plugin init");

    std::vector<PJRT_NamedValue> opts;
    if (plugin_path.find("axon") != std::string::npos) {
      // Dev-tunnel plugin needs session options; a stock libtpu PJRT
      // plugin takes none.
      if (!getenv("AXON_POOL_SVC_OVERRIDE"))
        setenv("AXON_POOL_SVC_OVERRIDE", "127.0.0.1", 0);
      static char session[64];
      snprintf(session, sizeof(session), "odtk-cppapi-%d", getpid());
      const char* gen = getenv("PALLAS_AXON_TPU_GEN");
      std::string topo = gen ? std::string(gen) + ":1x1x1" : "v5e:1x1x1";
      opts.push_back(Str("topology", topo));
      opts.push_back(Str("session_id", session));
      opts.push_back(Int("remote_compile", 1));
      opts.push_back(Int("local_only", 0));
      opts.push_back(Int("priority", 0));
      opts.push_back(Int("n_slices", 1));
      opts.push_back(Int("rank", 0));
    }
    PJRT_Client_Create_Args cc{PJRT_Client_Create_Args_STRUCT_SIZE, nullptr};
    cc.create_options = opts.data();
    cc.num_options = opts.size();
    Check(api_, api_->PJRT_Client_Create(&cc), "client create");
    client_ = cc.client;

    PJRT_Client_AddressableDevices_Args dv{
        PJRT_Client_AddressableDevices_Args_STRUCT_SIZE, nullptr, client_};
    Check(api_, api_->PJRT_Client_AddressableDevices(&dv), "devices");
    if (dv.num_addressable_devices == 0)
      throw std::runtime_error("no addressable devices");
    device_ = dv.addressable_devices[0];
  }

  const PJRT_Api* api() const { return api_; }
  PJRT_Client* client() const { return client_; }
  PJRT_Device* device() const { return device_; }

  void Await(PJRT_Event* ev, const char* what) const {
    if (!ev) return;
    for (int i = 0; i < 60000; ++i) {
      PJRT_Event_IsReady_Args ir{PJRT_Event_IsReady_Args_STRUCT_SIZE, nullptr,
                                 ev, false};
      Check(api_, api_->PJRT_Event_IsReady(&ir), what);
      if (ir.is_ready) break;
      usleep(1000);
    }
    PJRT_Event_Error_Args ee{PJRT_Event_Error_Args_STRUCT_SIZE, nullptr, ev};
    Check(api_, api_->PJRT_Event_Error(&ee), what);
    PJRT_Event_Destroy_Args ed{PJRT_Event_Destroy_Args_STRUCT_SIZE, nullptr,
                               ev};
    api_->PJRT_Event_Destroy(&ed);
  }

 private:
  static PJRT_NamedValue Str(const char* name, const std::string& val) {
    static std::vector<std::string>* pool = new std::vector<std::string>();
    pool->push_back(val);
    PJRT_NamedValue nv{};
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.name = name;
    nv.name_size = strlen(name);
    nv.type = PJRT_NamedValue_kString;
    nv.string_value = pool->back().c_str();
    nv.value_size = pool->back().size();
    return nv;
  }
  static PJRT_NamedValue Int(const char* name, int64_t val) {
    PJRT_NamedValue nv{};
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.name = name;
    nv.name_size = strlen(name);
    nv.type = PJRT_NamedValue_kInt64;
    nv.int64_value = val;
    nv.value_size = 1;
    return nv;
  }

  void* handle_;
  const PJRT_Api* api_;
  PJRT_Client* client_;
  PJRT_Device* device_;
};

struct Detections {
  std::vector<float> scores;   // [detections]
  std::vector<float> boxes;    // [detections * box_dim] (x1,y1,x2,y2[,s,c])
  std::vector<float> classes;  // [detections]
};

class Engine {
 public:
  Engine(Runtime* rt, const std::string& engine_path) : rt_(rt) {
    std::ifstream f(engine_path, std::ios::binary);
    if (!f) throw std::runtime_error("cannot open " + engine_path);
    char magic[8];
    f.read(magic, 8);
    if (std::memcmp(magic, "ODTKCPP1", 8) != 0)
      throw std::runtime_error(engine_path + " is not an odtk cpp engine");
    uint32_t meta_len;
    f.read(reinterpret_cast<char*>(&meta_len), 4);
    meta_.resize(meta_len);
    f.read(meta_.data(), meta_len);
    uint64_t prog_len;
    f.read(reinterpret_cast<char*>(&prog_len), 8);
    std::string prog(prog_len, 0);
    f.read(prog.data(), prog_len);
    uint64_t opts_len;
    f.read(reinterpret_cast<char*>(&opts_len), 8);
    std::string copts(opts_len, 0);
    f.read(copts.data(), opts_len);

    height_ = std::stoi(JsonField(meta_, "height"));
    width_ = std::stoi(JsonField(meta_, "width"));
    batch_ = std::stoi(JsonField(meta_, "batch"));
    detections_ = std::stoi(JsonField(meta_, "detections"));
    box_dim_ = std::stoi(JsonField(meta_, "box_dim"));
    stride_ = std::stoi(JsonField(meta_, "stride"));
    // engines exported with input_format='u8' take raw RGB bytes and
    // normalize in-graph (4x fewer host->device bytes); absent field
    // (older engines) means the f32 contract
    input_u8_ = JsonField(meta_, "input") == "u8";

    const PJRT_Api* api = rt_->api();
    PJRT_Program program{PJRT_Program_STRUCT_SIZE, nullptr, prog.data(),
                         prog.size(), "mlir", 4};
    PJRT_Client_Compile_Args comp{PJRT_Client_Compile_Args_STRUCT_SIZE,
                                  nullptr, rt_->client(), &program,
                                  copts.data(), copts.size()};
    Check(api, api->PJRT_Client_Compile(&comp), "compile");
    exe_ = comp.executable;
  }

  int input_size() const { return width_ > height_ ? width_ : height_; }
  int height() const { return height_; }
  int width() const { return width_; }
  int max_batch() const { return batch_; }
  int max_detections() const { return detections_; }
  int box_dim() const { return box_dim_; }
  int stride() const { return stride_; }
  bool input_u8() const { return input_u8_; }
  const std::string& meta() const { return meta_; }

  // input: float32 NHWC [batch, height, width, 3], preprocessed
  // (RGB/255 normalized by ImageNet mean/std, zero-padded).
  Detections Infer(const float* input) {
    if (input_u8_)
      throw std::runtime_error("engine takes u8 input (input_u8())");
    return InferRaw(input, PJRT_Buffer_Type_F32);
  }

  // input: raw RGB uint8 NHWC, letterboxed (black-padded); engines
  // exported with input_format='u8' normalize in-graph.
  Detections Infer(const uint8_t* input) {
    if (!input_u8_)
      throw std::runtime_error("engine takes f32 input (input_u8())");
    return InferRaw(input, PJRT_Buffer_Type_U8);
  }

 private:
  Detections InferRaw(const void* input, PJRT_Buffer_Type type) {
    const PJRT_Api* api = rt_->api();
    int64_t dims[4] = {batch_, height_, width_, 3};
    PJRT_Client_BufferFromHostBuffer_Args bh{
        PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE, nullptr};
    bh.client = rt_->client();
    bh.data = input;
    bh.type = type;
    bh.dims = dims;
    bh.num_dims = 4;
    bh.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    bh.device = rt_->device();
    Check(api, api->PJRT_Client_BufferFromHostBuffer(&bh), "h2d");
    rt_->Await(bh.done_with_host_buffer, "h2d done");
    PJRT_Buffer* in = bh.buffer;

    PJRT_ExecuteOptions eo{PJRT_ExecuteOptions_STRUCT_SIZE, nullptr};
    PJRT_Buffer* arg_list[1] = {in};
    PJRT_Buffer* const* args_ptr = arg_list;
    PJRT_Buffer* outs[3] = {nullptr, nullptr, nullptr};
    PJRT_Buffer** outs_ptr = outs;
    PJRT_Event* done = nullptr;
    PJRT_LoadedExecutable_Execute_Args ex{
        PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE, nullptr};
    ex.executable = exe_;
    ex.options = &eo;
    ex.num_devices = 1;
    ex.num_args = 1;
    ex.argument_lists = &args_ptr;
    ex.output_lists = &outs_ptr;
    ex.device_complete_events = &done;
    Check(api, api->PJRT_LoadedExecutable_Execute(&ex), "execute");
    rt_->Await(done, "execute done");

    Detections det;
    det.scores.resize(batch_ * detections_);
    det.boxes.resize(batch_ * detections_ * box_dim_);
    det.classes.resize(batch_ * detections_);
    FetchBuffer(outs[0], det.scores.data(),
                det.scores.size() * sizeof(float));
    FetchBuffer(outs[1], det.boxes.data(), det.boxes.size() * sizeof(float));
    FetchBuffer(outs[2], det.classes.data(),
                det.classes.size() * sizeof(float));
    for (PJRT_Buffer* b : outs) DestroyBuffer(b);
    DestroyBuffer(in);
    return det;
  }

  void FetchBuffer(PJRT_Buffer* buf, void* dst, size_t size) {
    const PJRT_Api* api = rt_->api();
    PJRT_Buffer_ToHostBuffer_Args th{PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE,
                                     nullptr};
    th.src = buf;
    th.dst = dst;
    th.dst_size = size;
    Check(api, api->PJRT_Buffer_ToHostBuffer(&th), "d2h");
    rt_->Await(th.event, "d2h done");
  }
  void DestroyBuffer(PJRT_Buffer* b) {
    if (!b) return;
    PJRT_Buffer_Destroy_Args d{PJRT_Buffer_Destroy_Args_STRUCT_SIZE, nullptr,
                               b};
    rt_->api()->PJRT_Buffer_Destroy(&d);
  }

  Runtime* rt_;
  PJRT_LoadedExecutable* exe_;
  std::string meta_;
  int height_, width_, batch_, detections_, box_dim_, stride_;
  bool input_u8_ = false;
};

// ImageNet preprocessing shared by the samples (odtk/data.py:25-26).
inline void Preprocess(const uint8_t* rgb, int h, int w, float* out,
                       int out_h, int out_w) {
  const float mean[3] = {0.485f, 0.456f, 0.406f};
  const float stdv[3] = {0.229f, 0.224f, 0.225f};
  std::memset(out, 0, sizeof(float) * out_h * out_w * 3);
  for (int y = 0; y < h && y < out_h; ++y)
    for (int x = 0; x < w && x < out_w; ++x)
      for (int c = 0; c < 3; ++c)
        out[(y * out_w + x) * 3 + c] =
            (rgb[(y * w + x) * 3 + c] / 255.0f - mean[c]) / stdv[c];
}

// u8-engine preprocessing: plain letterbox byte paste (normalization
// runs in-graph; padding stays black).
inline void PreprocessU8(const uint8_t* rgb, int h, int w, uint8_t* out,
                         int out_h, int out_w) {
  std::memset(out, 0, static_cast<size_t>(out_h) * out_w * 3);
  for (int y = 0; y < h && y < out_h; ++y)
    std::memcpy(out + static_cast<size_t>(y) * out_w * 3,
                rgb + static_cast<size_t>(y) * w * 3,
                static_cast<size_t>(w < out_w ? w : out_w) * 3);
}

}  // namespace odtk

#endif  // ODTK_PJRT_H_
