// Generic PJRT C-API client: executes an exported StableHLO module on any
// PJRT plugin (libtpu.so, the axon relay plugin, or any other conforming
// .so exposing GetPjrtApi).
//
// This is the native consumption path for the exporter's `stablehlo` format
// (bsyolo_tpu/engine/exporter.py): the .stablehlo.mlir sidecar written next
// to the jax.export artifact is handed straight to PJRT_Client_Compile, so a
// C++ service runs the exact compiled graph Python runs — the TPU-native
// answer to the reference's C++ ONNXRuntime/TensorRT/OpenVINO examples
// (reference examples/YOLOv8-CPP-Inference, -ONNXRuntime-CPP, etc.), but
// against the real XLA toolchain instead of a converted graph.
//
// Usage:
//   pjrt_client <plugin.so> <module.mlir|.bc> <input.bin> <output.bin> \
//               [--options FILE] [--compile-options FILE]
//
// input.bin:  u32 ndim, i64 dims[ndim], f32 data (row-major)
// output.bin: per output: u32 ndim, i64 dims[ndim], f32 data
// --options FILE: one PJRT client create-option per line, key=i:<int64> or
//   key=s:<string> (e.g. the axon relay's topology/session_id; dump with
//   examples/cpp_client/dump_pjrt_inputs.py)
// --compile-options FILE: serialized xla CompileOptionsProto; when omitted an
//   empty proto (all defaults) is sent.

#include <dlfcn.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace {

[[noreturn]] void Die(const std::string& msg) {
  std::fprintf(stderr, "pjrt_client: %s\n", msg.c_str());
  std::exit(1);
}

const PJRT_Api* g_api = nullptr;

void Check(PJRT_Error* err, const char* what) {
  if (err == nullptr) return;
  PJRT_Error_Message_Args margs;
  std::memset(&margs, 0, sizeof(margs));
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.error = err;
  g_api->PJRT_Error_Message(&margs);
  std::string msg(margs.message, margs.message_size);
  PJRT_Error_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.error = err;
  g_api->PJRT_Error_Destroy(&dargs);
  Die(std::string(what) + ": " + msg);
}

void AwaitAndDestroy(PJRT_Event* ev, const char* what) {
  PJRT_Event_Await_Args aargs;
  std::memset(&aargs, 0, sizeof(aargs));
  aargs.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  aargs.event = ev;
  Check(g_api->PJRT_Event_Await(&aargs), what);
  PJRT_Event_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  dargs.event = ev;
  Check(g_api->PJRT_Event_Destroy(&dargs), "Event_Destroy");
}

std::string ReadFile(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) Die("cannot read " + path);
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

struct Option {
  std::string key;
  bool is_int;
  int64_t i;
  std::string s;
};

std::vector<Option> ParseOptions(const std::string& path) {
  std::vector<Option> opts;
  std::ifstream f(path);
  if (!f) Die("cannot read options file " + path);
  std::string line;
  while (std::getline(f, line)) {
    if (line.empty() || line[0] == '#') continue;
    auto eq = line.find('=');
    if (eq == std::string::npos || eq + 2 >= line.size() || line[eq + 2] != ':')
      Die("bad option line (want key=i:<int> or key=s:<str>): " + line);
    Option o;
    o.key = line.substr(0, eq);
    char kind = line[eq + 1];
    std::string val = line.substr(eq + 3);
    if (kind == 'i') {
      o.is_int = true;
      o.i = std::strtoll(val.c_str(), nullptr, 10);
    } else if (kind == 's') {
      o.is_int = false;
      o.s = val;
    } else {
      Die("bad option kind in: " + line);
    }
    opts.push_back(std::move(o));
  }
  return opts;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 5) {
    std::fprintf(stderr,
                 "usage: %s <plugin.so> <module.mlir> <input.bin> <output.bin> "
                 "[--options FILE] [--compile-options FILE]\n",
                 argv[0]);
    return 2;
  }
  const std::string so_path = argv[1], module_path = argv[2];
  const std::string input_path = argv[3], output_path = argv[4];
  std::string options_path, compile_options_path;
  for (int i = 5; i + 1 < argc; i += 2) {
    if (std::string(argv[i]) == "--options") options_path = argv[i + 1];
    else if (std::string(argv[i]) == "--compile-options") compile_options_path = argv[i + 1];
    else Die(std::string("unknown flag ") + argv[i]);
  }

  // ---- plugin ----
  void* handle = dlopen(so_path.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (!handle) Die(std::string("dlopen failed: ") + dlerror());
  using GetPjrtApiFn = const PJRT_Api* (*)();
  auto get_api = reinterpret_cast<GetPjrtApiFn>(dlsym(handle, "GetPjrtApi"));
  if (!get_api) Die("plugin has no GetPjrtApi symbol");
  g_api = get_api();
  if (!g_api) Die("GetPjrtApi returned null");
  std::fprintf(stderr, "pjrt_client: plugin api v%d.%d\n",
               g_api->pjrt_api_version.major_version,
               g_api->pjrt_api_version.minor_version);

  PJRT_Plugin_Initialize_Args pinit;
  std::memset(&pinit, 0, sizeof(pinit));
  pinit.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  Check(g_api->PJRT_Plugin_Initialize(&pinit), "Plugin_Initialize");

  // ---- client ----
  std::vector<Option> opts;
  if (!options_path.empty()) opts = ParseOptions(options_path);
  std::vector<PJRT_NamedValue> nvs(opts.size());
  for (size_t i = 0; i < opts.size(); ++i) {
    std::memset(&nvs[i], 0, sizeof(nvs[i]));
    nvs[i].struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nvs[i].name = opts[i].key.c_str();
    nvs[i].name_size = opts[i].key.size();
    if (opts[i].is_int) {
      nvs[i].type = PJRT_NamedValue_kInt64;
      nvs[i].int64_value = opts[i].i;
      nvs[i].value_size = 1;
    } else {
      nvs[i].type = PJRT_NamedValue_kString;
      nvs[i].string_value = opts[i].s.c_str();
      nvs[i].value_size = opts[i].s.size();
    }
  }
  PJRT_Client_Create_Args cargs;
  std::memset(&cargs, 0, sizeof(cargs));
  cargs.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cargs.create_options = nvs.data();
  cargs.num_options = nvs.size();
  Check(g_api->PJRT_Client_Create(&cargs), "Client_Create");
  PJRT_Client* client = cargs.client;

  PJRT_Client_AddressableDevices_Args dev_args;
  std::memset(&dev_args, 0, sizeof(dev_args));
  dev_args.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  dev_args.client = client;
  Check(g_api->PJRT_Client_AddressableDevices(&dev_args), "AddressableDevices");
  if (dev_args.num_addressable_devices == 0) Die("no addressable devices");
  PJRT_Device* device = dev_args.addressable_devices[0];
  std::fprintf(stderr, "pjrt_client: %zu addressable device(s)\n",
               dev_args.num_addressable_devices);

  // ---- compile ----
  std::string module = ReadFile(module_path);
  std::string compile_options;
  if (!compile_options_path.empty()) compile_options = ReadFile(compile_options_path);
  PJRT_Program program;
  std::memset(&program, 0, sizeof(program));
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = module.data();
  program.code_size = module.size();
  static const char kFormat[] = "mlir";
  program.format = kFormat;
  program.format_size = sizeof(kFormat) - 1;

  PJRT_Client_Compile_Args comp;
  std::memset(&comp, 0, sizeof(comp));
  comp.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  comp.client = client;
  comp.program = &program;
  comp.compile_options = compile_options.data();
  comp.compile_options_size = compile_options.size();
  Check(g_api->PJRT_Client_Compile(&comp), "Client_Compile");
  PJRT_LoadedExecutable* lexec = comp.executable;
  std::fprintf(stderr, "pjrt_client: compiled %zu-byte module\n", module.size());

  PJRT_LoadedExecutable_GetExecutable_Args gexec;
  std::memset(&gexec, 0, sizeof(gexec));
  gexec.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
  gexec.loaded_executable = lexec;
  Check(g_api->PJRT_LoadedExecutable_GetExecutable(&gexec), "GetExecutable");
  PJRT_Executable_NumOutputs_Args nout;
  std::memset(&nout, 0, sizeof(nout));
  nout.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
  nout.executable = gexec.executable;
  Check(g_api->PJRT_Executable_NumOutputs(&nout), "NumOutputs");
  size_t num_outputs = nout.num_outputs;

  // ---- input buffer ----
  std::string in_blob = ReadFile(input_path);
  if (in_blob.size() < 4) Die("input.bin too small");
  const char* p = in_blob.data();
  uint32_t ndim;
  std::memcpy(&ndim, p, 4);
  p += 4;
  if (ndim > 8 || in_blob.size() < 4 + static_cast<size_t>(ndim) * 8)
    Die("input.bin truncated or bad ndim");
  std::vector<int64_t> dims(ndim);
  std::memcpy(dims.data(), p, ndim * 8);
  p += ndim * 8;
  size_t n_elems = 1;
  for (auto d : dims) {
    if (d <= 0 || n_elems > (1ull << 40) / static_cast<size_t>(d))
      Die("input.bin has bad dims");
    n_elems *= static_cast<size_t>(d);
  }
  if (in_blob.size() < 4 + ndim * 8 + n_elems * 4) Die("input.bin truncated");

  PJRT_Client_BufferFromHostBuffer_Args hb;
  std::memset(&hb, 0, sizeof(hb));
  hb.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
  hb.client = client;
  hb.data = p;
  hb.type = PJRT_Buffer_Type_F32;
  hb.dims = dims.data();
  hb.num_dims = ndim;
  hb.host_buffer_semantics = PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
  hb.device = device;
  Check(g_api->PJRT_Client_BufferFromHostBuffer(&hb), "BufferFromHostBuffer");
  AwaitAndDestroy(hb.done_with_host_buffer, "host buffer transfer");
  PJRT_Buffer* in_buf = hb.buffer;

  // ---- execute ----
  PJRT_ExecuteOptions eopts;
  std::memset(&eopts, 0, sizeof(eopts));
  eopts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
  PJRT_Buffer* arg_list[] = {in_buf};
  PJRT_Buffer* const* arg_lists[] = {arg_list};
  std::vector<PJRT_Buffer*> out_list(num_outputs, nullptr);
  PJRT_Buffer** out_lists[] = {out_list.data()};
  PJRT_Event* done = nullptr;

  PJRT_LoadedExecutable_Execute_Args ex;
  std::memset(&ex, 0, sizeof(ex));
  ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  ex.executable = lexec;
  ex.options = &eopts;
  ex.argument_lists = arg_lists;
  ex.num_devices = 1;
  ex.num_args = 1;
  ex.output_lists = out_lists;
  ex.device_complete_events = &done;
  Check(g_api->PJRT_LoadedExecutable_Execute(&ex), "Execute");
  AwaitAndDestroy(done, "execution");

  // ---- fetch outputs ----
  std::ofstream out(output_path, std::ios::binary);
  if (!out) Die("cannot write " + output_path);
  for (size_t oi = 0; oi < num_outputs; ++oi) {
    PJRT_Buffer* b = out_list[oi];
    PJRT_Buffer_Dimensions_Args bd;
    std::memset(&bd, 0, sizeof(bd));
    bd.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
    bd.buffer = b;
    Check(g_api->PJRT_Buffer_Dimensions(&bd), "Buffer_Dimensions");

    // Request an explicit row-major host layout: with host_layout null the
    // copy uses the buffer's DEVICE layout, and on TPU a (1,N,6) det tensor
    // comes back minor-to-major permuted (reads as transposed garbage).
    std::vector<int64_t> m2m(bd.num_dims);
    for (size_t d = 0; d < bd.num_dims; ++d)
      m2m[d] = static_cast<int64_t>(bd.num_dims - 1 - d);
    PJRT_Buffer_MemoryLayout row_major;
    std::memset(&row_major, 0, sizeof(row_major));
    row_major.struct_size = PJRT_Buffer_MemoryLayout_STRUCT_SIZE;
    row_major.type = PJRT_Buffer_MemoryLayout_Type_Tiled;
    row_major.tiled.struct_size = PJRT_Buffer_MemoryLayout_Tiled_STRUCT_SIZE;
    row_major.tiled.minor_to_major = m2m.data();
    row_major.tiled.minor_to_major_size = bd.num_dims;

    PJRT_Buffer_ToHostBuffer_Args th;
    std::memset(&th, 0, sizeof(th));
    th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    th.src = b;
    th.host_layout = &row_major;
    Check(g_api->PJRT_Buffer_ToHostBuffer(&th), "ToHostBuffer(size)");
    std::vector<char> host(th.dst_size);
    th.dst = host.data();
    Check(g_api->PJRT_Buffer_ToHostBuffer(&th), "ToHostBuffer(copy)");
    AwaitAndDestroy(th.event, "device-to-host copy");

    uint32_t ond = static_cast<uint32_t>(bd.num_dims);
    out.write(reinterpret_cast<const char*>(&ond), 4);
    out.write(reinterpret_cast<const char*>(bd.dims), ond * 8);
    out.write(host.data(), host.size());
    std::fprintf(stderr, "pjrt_client: output %zu: %u dims, %zu bytes\n", oi, ond,
                 host.size());

    PJRT_Buffer_Destroy_Args bdestroy;
    std::memset(&bdestroy, 0, sizeof(bdestroy));
    bdestroy.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
    bdestroy.buffer = b;
    Check(g_api->PJRT_Buffer_Destroy(&bdestroy), "Buffer_Destroy(out)");
  }

  PJRT_Buffer_Destroy_Args indestroy;
  std::memset(&indestroy, 0, sizeof(indestroy));
  indestroy.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
  indestroy.buffer = in_buf;
  Check(g_api->PJRT_Buffer_Destroy(&indestroy), "Buffer_Destroy(in)");

  PJRT_LoadedExecutable_Destroy_Args ldestroy;
  std::memset(&ldestroy, 0, sizeof(ldestroy));
  ldestroy.struct_size = PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE;
  ldestroy.executable = lexec;
  Check(g_api->PJRT_LoadedExecutable_Destroy(&ldestroy), "LoadedExecutable_Destroy");

  PJRT_Client_Destroy_Args cdestroy;
  std::memset(&cdestroy, 0, sizeof(cdestroy));
  cdestroy.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
  cdestroy.client = client;
  Check(g_api->PJRT_Client_Destroy(&cdestroy), "Client_Destroy");

  std::fprintf(stderr, "pjrt_client: OK\n");
  return 0;
}
