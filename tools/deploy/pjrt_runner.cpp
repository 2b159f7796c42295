// Standalone C++ deployment runtime for exported cddmsl_tpu models.
//
// The TPU-native counterpart of the reference's C++ deploy example
// (reference: tools/deploy/torchscript_mask_rcnn.cpp + CMakeLists.txt,
// which loads a TorchScript artifact with libtorch): here the artifact is
// the raw StableHLO module produced by cddmsl_tpu/export/api.py
// (`model.mlir`), and the runtime is any PJRT C-API plugin (libtpu /
// CPU / the axon tunnel plugin) loaded with dlopen — no Python, no JAX.
//
//   pjrt_runner --plugin /path/libfoo_pjrt.so --module model.mlir \
//               [--input x.npy]... [--opt key=value]... \
//               [--repeat N] [--out-dir DIR]
//
// --opt values that parse as integers are passed as PJRT int64 named
// values, everything else as strings (matches what jax's plugin
// registration does for e.g. {topology, session_id, n_slices}).
//
// Prints each output's dtype/shape/checksum and the per-iteration execute
// latency; optionally dumps outputs as .npy into --out-dir.
#include <dlfcn.h>

#include <chrono>
#include <cinttypes>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include "tensorflow/compiler/xla/pjrt/c/pjrt_c_api.h"

namespace {

[[noreturn]] void Die(const std::string& msg) {
  std::fprintf(stderr, "pjrt_runner: %s\n", msg.c_str());
  std::exit(1);
}

void CheckErr(const PJRT_Api* api, PJRT_Error* err, const char* what) {
  if (err == nullptr) return;
  PJRT_Error_Message_Args m;
  std::memset(&m, 0, sizeof(m));
  m.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  m.error = err;
  api->PJRT_Error_Message(&m);
  std::string text(m.message, m.message_size);
  PJRT_Error_Destroy_Args d;
  std::memset(&d, 0, sizeof(d));
  d.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  d.error = err;
  api->PJRT_Error_Destroy(&d);
  Die(std::string(what) + ": " + text);
}

// ---------------------------------------------------------------- npy io
// Minimal NPY v1/v2 reader/writer (C-order, little-endian scalar dtypes).
struct NpyArray {
  std::string descr;          // e.g. "<f4"
  std::vector<int64_t> dims;
  std::vector<char> data;
};

PJRT_Buffer_Type DescrToType(const std::string& d) {
  if (d == "<f4") return PJRT_Buffer_Type_F32;
  if (d == "<f8") return PJRT_Buffer_Type_F64;
  if (d == "<f2") return PJRT_Buffer_Type_F16;
  if (d == "<i4") return PJRT_Buffer_Type_S32;
  if (d == "<i8") return PJRT_Buffer_Type_S64;
  if (d == "<i2") return PJRT_Buffer_Type_S16;
  if (d == "|i1") return PJRT_Buffer_Type_S8;
  if (d == "<u4") return PJRT_Buffer_Type_U32;
  if (d == "<u8") return PJRT_Buffer_Type_U64;
  if (d == "<u2") return PJRT_Buffer_Type_U16;
  if (d == "|u1") return PJRT_Buffer_Type_U8;
  if (d == "|b1") return PJRT_Buffer_Type_PRED;
  Die("unsupported npy dtype: " + d);
}

const char* TypeToDescr(PJRT_Buffer_Type t) {
  switch (t) {
    case PJRT_Buffer_Type_F32: return "<f4";
    case PJRT_Buffer_Type_F64: return "<f8";
    case PJRT_Buffer_Type_F16: return "<f2";
    case PJRT_Buffer_Type_BF16: return "<u2";  // raw bits; caller reinterprets
    case PJRT_Buffer_Type_S32: return "<i4";
    case PJRT_Buffer_Type_S64: return "<i8";
    case PJRT_Buffer_Type_S16: return "<i2";
    case PJRT_Buffer_Type_S8: return "|i1";
    case PJRT_Buffer_Type_U32: return "<u4";
    case PJRT_Buffer_Type_U64: return "<u8";
    case PJRT_Buffer_Type_U16: return "<u2";
    case PJRT_Buffer_Type_U8: return "|u1";
    case PJRT_Buffer_Type_PRED: return "|b1";
    default: return "|V1";
  }
}

const char* TypeName(PJRT_Buffer_Type t) {
  switch (t) {
    case PJRT_Buffer_Type_F32: return "f32";
    case PJRT_Buffer_Type_F64: return "f64";
    case PJRT_Buffer_Type_F16: return "f16";
    case PJRT_Buffer_Type_BF16: return "bf16";
    case PJRT_Buffer_Type_S32: return "s32";
    case PJRT_Buffer_Type_S64: return "s64";
    case PJRT_Buffer_Type_S16: return "s16";
    case PJRT_Buffer_Type_S8: return "s8";
    case PJRT_Buffer_Type_U32: return "u32";
    case PJRT_Buffer_Type_U64: return "u64";
    case PJRT_Buffer_Type_U16: return "u16";
    case PJRT_Buffer_Type_U8: return "u8";
    case PJRT_Buffer_Type_PRED: return "pred";
    default: return "?";
  }
}

NpyArray LoadNpy(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) Die("cannot open " + path);
  char magic[8];
  f.read(magic, 8);
  if (!f || std::memcmp(magic, "\x93NUMPY", 6) != 0) Die("not npy: " + path);
  uint32_t hlen = 0;
  if (magic[6] == 1) {
    uint16_t h16;
    f.read(reinterpret_cast<char*>(&h16), 2);
    hlen = h16;
  } else {
    f.read(reinterpret_cast<char*>(&hlen), 4);
  }
  std::string hdr(hlen, '\0');
  f.read(hdr.data(), hlen);
  NpyArray a;
  auto grab = [&](const char* key) -> std::string {
    size_t p = hdr.find(key);
    if (p == std::string::npos) Die("npy header missing " + std::string(key));
    p = hdr.find(':', p) + 1;
    while (p < hdr.size() && (hdr[p] == ' ')) ++p;
    if (hdr[p] == '\'') {
      size_t q = hdr.find('\'', p + 1);
      return hdr.substr(p + 1, q - p - 1);
    }
    if (hdr[p] == '(') {
      size_t q = hdr.find(')', p);
      return hdr.substr(p + 1, q - p - 1);
    }
    size_t q = hdr.find_first_of(",}", p);
    return hdr.substr(p, q - p);
  };
  a.descr = grab("'descr'");
  if (grab("'fortran_order'") != "False") Die("fortran-order npy unsupported");
  std::string shape = grab("'shape'");
  size_t pos = 0;
  while (pos < shape.size()) {
    size_t q = shape.find(',', pos);
    std::string tok = shape.substr(pos, q == std::string::npos ? q : q - pos);
    if (!tok.empty() && tok.find_first_not_of(" ") != std::string::npos)
      a.dims.push_back(std::strtoll(tok.c_str(), nullptr, 10));
    if (q == std::string::npos) break;
    pos = q + 1;
  }
  f.seekg(0, std::ios::end);
  auto end = f.tellg();
  f.seekg(8 + (magic[6] == 1 ? 2 : 4) + hlen, std::ios::beg);
  a.data.resize(static_cast<size_t>(end - f.tellg()));
  f.read(a.data.data(), a.data.size());
  return a;
}

void SaveNpy(const std::string& path, const std::string& descr,
             const std::vector<int64_t>& dims, const void* data, size_t size) {
  std::string shape = "(";
  for (size_t i = 0; i < dims.size(); ++i) {
    shape += std::to_string(dims[i]);
    shape += (dims.size() == 1 || i + 1 < dims.size()) ? "," : "";
  }
  shape += ")";
  std::string hdr = "{'descr': '" + descr +
                    "', 'fortran_order': False, 'shape': " + shape + ", }";
  size_t total = 10 + hdr.size() + 1;
  size_t pad = (64 - total % 64) % 64;
  hdr += std::string(pad, ' ');
  hdr += '\n';
  uint16_t hlen = static_cast<uint16_t>(hdr.size());
  std::ofstream f(path, std::ios::binary);
  f.write("\x93NUMPY\x01\x00", 8);
  f.write(reinterpret_cast<char*>(&hlen), 2);
  f.write(hdr.data(), hdr.size());
  f.write(static_cast<const char*>(data), size);
}

double Checksum(PJRT_Buffer_Type t, const void* data, size_t bytes) {
  double s = 0;
  if (t == PJRT_Buffer_Type_F32) {
    const float* p = static_cast<const float*>(data);
    for (size_t i = 0; i < bytes / 4; ++i) s += std::fabs(static_cast<double>(p[i]));
  } else if (t == PJRT_Buffer_Type_F64) {
    const double* p = static_cast<const double*>(data);
    for (size_t i = 0; i < bytes / 8; ++i) s += std::fabs(p[i]);
  } else if (t == PJRT_Buffer_Type_S32) {
    const int32_t* p = static_cast<const int32_t*>(data);
    for (size_t i = 0; i < bytes / 4; ++i) s += std::fabs(static_cast<double>(p[i]));
  } else if (t == PJRT_Buffer_Type_S64) {
    const int64_t* p = static_cast<const int64_t*>(data);
    for (size_t i = 0; i < bytes / 8; ++i) s += std::fabs(static_cast<double>(p[i]));
  } else {
    const unsigned char* p = static_cast<const unsigned char*>(data);
    for (size_t i = 0; i < bytes; ++i) s += p[i];
  }
  return s;
}

std::string ReadFile(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) Die("cannot open " + path);
  return std::string(std::istreambuf_iterator<char>(f), {});
}

}  // namespace

int main(int argc, char** argv) {
  std::string plugin_path, module_path, out_dir, compile_options_path;
  std::vector<std::string> input_paths;
  std::vector<std::pair<std::string, std::string>> raw_opts;
  int repeat = 1;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> std::string {
      if (i + 1 >= argc) Die("missing value after " + a);
      return argv[++i];
    };
    if (a == "--plugin") plugin_path = next();
    else if (a == "--module") module_path = next();
    else if (a == "--input") input_paths.push_back(next());
    else if (a == "--out-dir") out_dir = next();
    else if (a == "--compile-options") compile_options_path = next();
    else if (a == "--repeat") repeat = std::atoi(next().c_str());
    else if (a == "--opt") {
      std::string kv = next();
      size_t eq = kv.find('=');
      if (eq == std::string::npos) Die("--opt needs key=value: " + kv);
      raw_opts.emplace_back(kv.substr(0, eq), kv.substr(eq + 1));
    } else if (a == "--help" || a == "-h") {
      std::printf(
          "usage: pjrt_runner --plugin <pjrt_plugin.so> --module <model.mlir>\n"
          "                   [--input x.npy]... [--opt key=value]...\n"
          "                   [--repeat N] [--out-dir DIR]\n");
      return 0;
    } else {
      Die("unknown arg: " + a);
    }
  }
  if (plugin_path.empty() || module_path.empty())
    Die("--plugin and --module are required (see --help)");

  void* lib = dlopen(plugin_path.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (!lib) Die(std::string("dlopen failed: ") + dlerror());
  using GetPjrtApiFn = const PJRT_Api* (*)();
  auto get_api = reinterpret_cast<GetPjrtApiFn>(dlsym(lib, "GetPjrtApi"));
  if (!get_api) Die("plugin has no GetPjrtApi symbol");
  const PJRT_Api* api = get_api();
  if (!api) Die("GetPjrtApi returned null");
  std::printf("plugin: %s (PJRT C API v%d.%d, header v%d.%d)\n",
              plugin_path.c_str(), api->pjrt_api_version.major_version,
              api->pjrt_api_version.minor_version, PJRT_API_MAJOR,
              PJRT_API_MINOR);
  if (api->pjrt_api_version.major_version != PJRT_API_MAJOR)
    Die("PJRT C API major version mismatch");

  {
    PJRT_Plugin_Initialize_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
    CheckErr(api, api->PJRT_Plugin_Initialize(&args), "Plugin_Initialize");
  }

  // Typed named values: all-digit values go as int64 (what jax's plugin
  // registration produces for n_slices/remote_compile/...), rest as string.
  std::vector<PJRT_NamedValue> options(raw_opts.size());
  std::vector<int64_t> int_store(raw_opts.size());
  for (size_t i = 0; i < raw_opts.size(); ++i) {
    PJRT_NamedValue& v = options[i];
    std::memset(&v, 0, sizeof(v));
    v.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    v.name = raw_opts[i].first.c_str();
    v.name_size = raw_opts[i].first.size();
    const std::string& val = raw_opts[i].second;
    bool is_int = !val.empty() &&
                  val.find_first_not_of("0123456789-") == std::string::npos;
    if (is_int) {
      int_store[i] = std::strtoll(val.c_str(), nullptr, 10);
      v.type = PJRT_NamedValue_kInt64;
      v.int64_value = int_store[i];
      v.value_size = 1;
    } else {
      v.type = PJRT_NamedValue_kString;
      v.string_value = val.c_str();
      v.value_size = val.size();
    }
  }

  PJRT_Client* client = nullptr;
  {
    PJRT_Client_Create_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
    args.create_options = options.data();
    args.num_options = options.size();
    CheckErr(api, api->PJRT_Client_Create(&args), "Client_Create");
    client = args.client;
  }
  {
    PJRT_Client_PlatformName_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_PlatformName_Args_STRUCT_SIZE;
    args.client = client;
    CheckErr(api, api->PJRT_Client_PlatformName(&args), "PlatformName");
    std::printf("platform: %.*s\n", static_cast<int>(args.platform_name_size),
                args.platform_name);
  }

  PJRT_Device* device = nullptr;
  {
    PJRT_Client_AddressableDevices_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
    args.client = client;
    CheckErr(api, api->PJRT_Client_AddressableDevices(&args),
             "AddressableDevices");
    if (args.num_addressable_devices == 0) Die("no addressable devices");
    std::printf("addressable devices: %zu\n", args.num_addressable_devices);
    device = args.addressable_devices[0];
  }

  // Compile the StableHLO module (bytecode or textual MLIR both accepted).
  std::string code = ReadFile(module_path);
  PJRT_LoadedExecutable* exec = nullptr;
  {
    PJRT_Program prog;
    std::memset(&prog, 0, sizeof(prog));
    prog.struct_size = PJRT_Program_STRUCT_SIZE;
    prog.code = code.data();
    prog.code_size = code.size();
    static const char kFmt[] = "mlir";
    prog.format = kFmt;
    prog.format_size = sizeof(kFmt) - 1;
    PJRT_Client_Compile_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
    args.client = client;
    args.program = &prog;
    // Serialized xla CompileOptionsProto. The hand-encoded minimum a
    // backend accepts: executable_build_options (field 3) with
    // device_ordinal=-1 (field 1), num_replicas=1 (field 4),
    // num_partitions=1 (field 5). An empty proto is rejected
    // ("Number of replicas (0) must be at least 1").
    static const unsigned char kMinOptions[] = {
        0x1a, 0x0f,  // field 3 (executable_build_options), len 15
        0x08, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff,
        0x01,        // device_ordinal = -1
        0x20, 0x01,  // num_replicas = 1
        0x28, 0x01,  // num_partitions = 1
    };
    std::string opt_bytes(reinterpret_cast<const char*>(kMinOptions),
                          sizeof(kMinOptions));
    if (!compile_options_path.empty()) opt_bytes = ReadFile(compile_options_path);
    args.compile_options = opt_bytes.data();
    args.compile_options_size = opt_bytes.size();
    auto t0 = std::chrono::steady_clock::now();
    CheckErr(api, api->PJRT_Client_Compile(&args), "Client_Compile");
    auto dt = std::chrono::duration<double>(std::chrono::steady_clock::now() - t0);
    exec = args.executable;
    std::printf("compiled %s (%zu bytes) in %.2fs\n", module_path.c_str(),
                code.size(), dt.count());
  }

  // Stage inputs.
  std::vector<PJRT_Buffer*> in_bufs;
  for (const std::string& p : input_paths) {
    NpyArray a = LoadNpy(p);
    PJRT_Client_BufferFromHostBuffer_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    args.client = client;
    args.data = a.data.data();
    args.type = DescrToType(a.descr);
    args.dims = a.dims.data();
    args.num_dims = a.dims.size();
    args.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    args.device = device;
    CheckErr(api, api->PJRT_Client_BufferFromHostBuffer(&args),
             "BufferFromHostBuffer");
    if (args.done_with_host_buffer) {
      PJRT_Event_Await_Args ev;
      std::memset(&ev, 0, sizeof(ev));
      ev.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
      ev.event = args.done_with_host_buffer;
      CheckErr(api, api->PJRT_Event_Await(&ev), "Await(h2d)");
      PJRT_Event_Destroy_Args dv;
      std::memset(&dv, 0, sizeof(dv));
      dv.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
      dv.event = ev.event;
      api->PJRT_Event_Destroy(&dv);
    }
    in_bufs.push_back(args.buffer);
    std::printf("input %s: %s dims=[", p.c_str(), TypeName(args.type));
    for (size_t i = 0; i < a.dims.size(); ++i)
      std::printf("%s%" PRId64, i ? "," : "", a.dims[i]);
    std::printf("]\n");
  }

  size_t num_outputs = 0;
  {
    PJRT_LoadedExecutable_GetExecutable_Args g;
    std::memset(&g, 0, sizeof(g));
    g.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
    g.loaded_executable = exec;
    CheckErr(api, api->PJRT_LoadedExecutable_GetExecutable(&g), "GetExecutable");
    PJRT_Executable_NumOutputs_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
    args.executable = g.executable;
    CheckErr(api, api->PJRT_Executable_NumOutputs(&args), "NumOutputs");
    num_outputs = args.num_outputs;
  }

  std::vector<PJRT_Buffer*> out_bufs(num_outputs, nullptr);
  double best_ms = 1e30;
  for (int it = 0; it < std::max(repeat, 1); ++it) {
    for (PJRT_Buffer* b : out_bufs) {
      if (!b) continue;
      PJRT_Buffer_Destroy_Args d;
      std::memset(&d, 0, sizeof(d));
      d.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
      d.buffer = b;
      api->PJRT_Buffer_Destroy(&d);
    }
    PJRT_ExecuteOptions opts;
    std::memset(&opts, 0, sizeof(opts));
    opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
    PJRT_Buffer* const* arg_list = in_bufs.data();
    PJRT_Buffer** out_list = out_bufs.data();
    PJRT_Event* done = nullptr;
    PJRT_LoadedExecutable_Execute_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    args.executable = exec;
    args.options = &opts;
    args.argument_lists = &arg_list;
    args.num_devices = 1;
    args.num_args = in_bufs.size();
    args.output_lists = &out_list;
    args.device_complete_events = &done;
    auto t0 = std::chrono::steady_clock::now();
    CheckErr(api, api->PJRT_LoadedExecutable_Execute(&args), "Execute");
    {
      PJRT_Event_Await_Args ev;
      std::memset(&ev, 0, sizeof(ev));
      ev.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
      ev.event = done;
      CheckErr(api, api->PJRT_Event_Await(&ev), "Await(execute)");
      PJRT_Event_Destroy_Args dv;
      std::memset(&dv, 0, sizeof(dv));
      dv.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
      dv.event = done;
      api->PJRT_Event_Destroy(&dv);
    }
    double ms = std::chrono::duration<double, std::milli>(
                    std::chrono::steady_clock::now() - t0)
                    .count();
    best_ms = std::min(best_ms, ms);
    std::printf("execute[%d]: %.3f ms\n", it, ms);
  }
  std::printf("best execute latency: %.3f ms over %d runs\n", best_ms,
              std::max(repeat, 1));

  for (size_t o = 0; o < num_outputs; ++o) {
    PJRT_Buffer* b = out_bufs[o];
    PJRT_Buffer_ElementType_Args et;
    std::memset(&et, 0, sizeof(et));
    et.struct_size = PJRT_Buffer_ElementType_Args_STRUCT_SIZE;
    et.buffer = b;
    CheckErr(api, api->PJRT_Buffer_ElementType(&et), "ElementType");
    PJRT_Buffer_Dimensions_Args dm;
    std::memset(&dm, 0, sizeof(dm));
    dm.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
    dm.buffer = b;
    CheckErr(api, api->PJRT_Buffer_Dimensions(&dm), "Dimensions");

    PJRT_Buffer_ToHostBuffer_Args th;
    std::memset(&th, 0, sizeof(th));
    th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    th.src = b;
    CheckErr(api, api->PJRT_Buffer_ToHostBuffer(&th), "ToHostBuffer(size)");
    std::vector<char> host(th.dst_size);
    std::memset(&th, 0, sizeof(th));
    th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    th.src = b;
    th.dst = host.data();
    th.dst_size = host.size();
    CheckErr(api, api->PJRT_Buffer_ToHostBuffer(&th), "ToHostBuffer");
    {
      PJRT_Event_Await_Args ev;
      std::memset(&ev, 0, sizeof(ev));
      ev.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
      ev.event = th.event;
      CheckErr(api, api->PJRT_Event_Await(&ev), "Await(d2h)");
      PJRT_Event_Destroy_Args dv;
      std::memset(&dv, 0, sizeof(dv));
      dv.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
      dv.event = th.event;
      api->PJRT_Event_Destroy(&dv);
    }
    std::vector<int64_t> dims(dm.dims, dm.dims + dm.num_dims);
    std::printf("output[%zu]: %s dims=[", o, TypeName(et.type));
    for (size_t i = 0; i < dims.size(); ++i)
      std::printf("%s%" PRId64, i ? "," : "", dims[i]);
    std::printf("] abs-sum=%.6g\n", Checksum(et.type, host.data(), host.size()));
    if (!out_dir.empty()) {
      SaveNpy(out_dir + "/output_" + std::to_string(o) + ".npy",
              TypeToDescr(et.type), dims, host.data(), host.size());
    }
  }

  for (PJRT_Buffer* b : in_bufs) {
    PJRT_Buffer_Destroy_Args d;
    std::memset(&d, 0, sizeof(d));
    d.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
    d.buffer = b;
    api->PJRT_Buffer_Destroy(&d);
  }
  for (PJRT_Buffer* b : out_bufs) {
    PJRT_Buffer_Destroy_Args d;
    std::memset(&d, 0, sizeof(d));
    d.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
    d.buffer = b;
    api->PJRT_Buffer_Destroy(&d);
  }
  {
    PJRT_LoadedExecutable_Destroy_Args d;
    std::memset(&d, 0, sizeof(d));
    d.struct_size = PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE;
    d.executable = exec;
    api->PJRT_LoadedExecutable_Destroy(&d);
  }
  {
    PJRT_Client_Destroy_Args d;
    std::memset(&d, 0, sizeof(d));
    d.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
    d.client = client;
    api->PJRT_Client_Destroy(&d);
  }
  std::printf("ok\n");
  return 0;
}
