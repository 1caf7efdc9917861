// Native StableHLO inference runner over the PJRT C API.
//
// TPU-native equivalent of the reference Ascend310 runner
// (ascend310_infer/src/main.cc): loads an exported StableHLO module
// (export.py writes <netG>.mlir + compile_options.bin), dlopens a PJRT
// plugin (libtpu.so on a TPU VM; any PJRT C-API plugin works), compiles the
// module, loops over the .bin noise inputs, executes, writes output .bins
// and an average-latency report to time_Result/test_perform_static.txt.
//
// Usage:
//   ./pjrt_runner --plugin_path=/path/libtpu.so \
//       --model_path=exp/infer/netG_9.mlir \
//       --compile_options_path=exp/infer/compile_options.bin \
//       --input0_path=exp/infer/noise_init \
//       --input1_path=exp/infer/noise_amps \
//       --input2_path=exp/infer/seed \
//       --output_dir=exp/infer/result
//
// Input contract (matches preprocess.py): input0 = f32 noise_init bins
// (one execution per file), input1 = f32 noise_amps bin, input2 = i32 seed
// bin. Shapes are read from the sidecar "io_spec.txt" written by export.py.

#include <dlfcn.h>
#include <sys/stat.h>

#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstring>
#include <filesystem>
#include <fstream>
#include <iostream>
#include <map>
#include <sstream>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace {

[[noreturn]] void Die(const std::string& msg);
int64_t ParseI64(const std::string& value, const std::string& what);

std::map<std::string, std::string> ParseFlags(int argc, char** argv) {
  std::map<std::string, std::string> flags;
  for (int i = 1; i < argc; ++i) {
    std::string arg = argv[i];
    if (arg.rfind("--", 0) != 0) continue;
    auto eq = arg.find('=');
    if (eq == std::string::npos) continue;
    std::string key = arg.substr(2, eq - 2);
    std::string val = arg.substr(eq + 1);
    if (key == "client_option") {
      // repeated: accumulate ';'-separated
      auto& cur = flags[key];
      cur = cur.empty() ? val : cur + ";" + val;
    } else {
      flags[key] = val;
    }
  }
  return flags;
}

// --client_option name=int:42 / name=str:hello (repeatable). Values live in
// `storage`, which must outlive the returned PJRT_NamedValues.
std::vector<PJRT_NamedValue> ParseClientOptions(
    const std::string& spec, std::vector<std::string>* storage) {
  std::vector<PJRT_NamedValue> out;
  if (spec.empty()) return out;
  // reserve so string pointers stay stable
  size_t n = 1;
  for (char c : spec) n += (c == ';');
  storage->reserve(storage->size() + 2 * n);
  std::istringstream ss(spec);
  std::string item;
  while (std::getline(ss, item, ';')) {
    auto eq = item.find('=');
    auto colon = item.find(':', eq);
    if (eq == std::string::npos || colon == std::string::npos) continue;
    storage->push_back(item.substr(0, eq));            // name
    std::string type = item.substr(eq + 1, colon - eq - 1);
    storage->push_back(item.substr(colon + 1));        // value
    const std::string& name = (*storage)[storage->size() - 2];
    const std::string& value = storage->back();
    PJRT_NamedValue nv;
    memset(&nv, 0, sizeof(nv));
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.extension_start = nullptr;
    nv.name = name.c_str();
    nv.name_size = name.size();
    if (type == "int") {
      nv.type = PJRT_NamedValue_kInt64;
      nv.int64_value = ParseI64(value, "client/compile option " + name);
    } else {
      nv.type = PJRT_NamedValue_kString;
      nv.string_value = value.c_str();
      nv.value_size = value.size();
    }
    out.push_back(nv);
  }
  return out;
}

[[noreturn]] void Die(const std::string& msg) {
  std::cerr << "pjrt_runner: " << msg << std::endl;
  exit(1);
}

int64_t ParseI64(const std::string& value, const std::string& what) {
  // std::stoll throws on malformed input, which would std::terminate with
  // no hint of WHICH flag/field was bad — fail through Die instead.
  try {
    size_t pos = 0;
    int64_t v = std::stoll(value, &pos);
    if (pos != value.size()) throw std::invalid_argument(value);
    return v;
  } catch (const std::exception&) {
    Die("malformed integer for " + what + ": '" + value + "'");
  }
}

void Check(const PJRT_Api* api, PJRT_Error* err, const std::string& what) {
  if (err == nullptr) return;
  PJRT_Error_Message_Args margs;
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.extension_start = nullptr;
  margs.error = err;
  api->PJRT_Error_Message(&margs);
  std::string msg(margs.message, margs.message_size);
  PJRT_Error_Destroy_Args dargs;
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.extension_start = nullptr;
  dargs.error = err;
  api->PJRT_Error_Destroy(&dargs);
  Die(what + ": " + msg);
}

void AwaitEvent(const PJRT_Api* api, PJRT_Event* event,
                const std::string& what) {
  if (event == nullptr) return;
  PJRT_Event_Await_Args args;
  args.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  args.extension_start = nullptr;
  args.event = event;
  Check(api, api->PJRT_Event_Await(&args), what);
  PJRT_Event_Destroy_Args dargs;
  dargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  dargs.extension_start = nullptr;
  dargs.event = event;
  Check(api, api->PJRT_Event_Destroy(&dargs), what + " (destroy)");
}

std::string ReadFileToString(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) Die("cannot read " + path);
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

std::vector<std::string> GetAllFiles(const std::string& dir) {
  // reference GetAllFiles (ascend310_infer/src/utils.cc:25-44). Uses
  // std::filesystem so paths with spaces/metacharacters are safe.
  std::vector<std::string> files;
  std::error_code ec;
  for (const auto& entry : std::filesystem::directory_iterator(dir, ec)) {
    if (entry.is_regular_file() && entry.path().extension() == ".bin")
      files.push_back(entry.path().string());
  }
  std::sort(files.begin(), files.end());
  return files;
}

void WriteResult(const std::string& path, const void* data, size_t size) {
  std::ofstream f(path, std::ios::binary);
  if (!f) Die("cannot write " + path);
  f.write(reinterpret_cast<const char*>(data), size);
}

struct IoSpec {
  std::vector<std::vector<int64_t>> input_dims;
  std::vector<PJRT_Buffer_Type> input_types;
};

// io_spec.txt: one line per input: "f32 1,128,33,33" / "s32" (scalar)
IoSpec ReadIoSpec(const std::string& path) {
  IoSpec spec;
  std::ifstream f(path);
  if (!f) Die("cannot read io spec " + path);
  std::string line;
  while (std::getline(f, line)) {
    if (line.empty()) continue;
    std::istringstream ss(line);
    std::string type;
    ss >> type;
    if (type == "f32") spec.input_types.push_back(PJRT_Buffer_Type_F32);
    else if (type == "s32") spec.input_types.push_back(PJRT_Buffer_Type_S32);
    else Die("unknown dtype in io spec: " + type);
    std::vector<int64_t> dims;
    std::string rest;
    ss >> rest;
    if (!rest.empty()) {
      std::istringstream ds(rest);
      std::string tok;
      while (std::getline(ds, tok, ','))
        dims.push_back(ParseI64(tok, "io_spec dim"));
    }
    spec.input_dims.push_back(dims);
  }
  return spec;
}

}  // namespace

int main(int argc, char** argv) {
  auto flags = ParseFlags(argc, argv);
  auto get = [&](const std::string& k, const std::string& dflt) {
    auto it = flags.find(k);
    return it == flags.end() ? dflt : it->second;
  };
  const std::string plugin_path = get("plugin_path", "libtpu.so");
  const std::string model_path = get("model_path", "");
  const std::string options_path = get("compile_options_path", "");
  const std::string input0 = get("input0_path", "");
  const std::string input1 = get("input1_path", "");
  const std::string input2 = get("input2_path", "");
  const std::string output_dir = get("output_dir", "result");
  if (model_path.empty() || input0.empty())
    Die("--model_path and --input0_path are required");

  // --- load plugin
  void* handle = dlopen(plugin_path.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (!handle) Die(std::string("dlopen failed: ") + dlerror());
  using GetPjrtApiFn = const PJRT_Api* (*)();
  auto get_api = reinterpret_cast<GetPjrtApiFn>(dlsym(handle, "GetPjrtApi"));
  if (!get_api) Die("plugin has no GetPjrtApi symbol");
  const PJRT_Api* api = get_api();

  {
    PJRT_Plugin_Initialize_Args args;
    args.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
    args.extension_start = nullptr;
    Check(api, api->PJRT_Plugin_Initialize(&args), "plugin init");
  }

  // --- client
  std::vector<std::string> option_storage;
  std::vector<PJRT_NamedValue> client_options =
      ParseClientOptions(get("client_option", ""), &option_storage);
  PJRT_Client* client = nullptr;
  {
    PJRT_Client_Create_Args args;
    args.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
    args.extension_start = nullptr;
    args.create_options = client_options.data();
    args.num_options = client_options.size();
    args.kv_get_callback = nullptr;
    args.kv_get_user_arg = nullptr;
    args.kv_put_callback = nullptr;
    args.kv_put_user_arg = nullptr;
    args.client = nullptr;
    Check(api, api->PJRT_Client_Create(&args), "client create");
    client = args.client;
  }

  PJRT_Device* device = nullptr;
  {
    PJRT_Client_AddressableDevices_Args args;
    args.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
    args.extension_start = nullptr;
    args.client = client;
    Check(api, api->PJRT_Client_AddressableDevices(&args), "devices");
    if (args.num_addressable_devices == 0) Die("no addressable devices");
    device = args.addressable_devices[0];
  }

  // --- compile
  std::string mlir = ReadFileToString(model_path);
  std::string options =
      options_path.empty() ? std::string() : ReadFileToString(options_path);
  PJRT_LoadedExecutable* executable = nullptr;
  {
    PJRT_Program program;
    program.struct_size = PJRT_Program_STRUCT_SIZE;
    program.extension_start = nullptr;
    program.code = mlir.data();
    program.code_size = mlir.size();
    static const char kFormat[] = "mlir";
    program.format = kFormat;
    program.format_size = sizeof(kFormat) - 1;

    PJRT_Client_Compile_Args args;
    args.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
    args.extension_start = nullptr;
    args.client = client;
    args.program = &program;
    args.compile_options = options.data();
    args.compile_options_size = options.size();
    args.executable = nullptr;
    Check(api, api->PJRT_Client_Compile(&args), "compile");
    executable = args.executable;
  }
  std::cerr << "compiled " << model_path << std::endl;

  size_t slash = model_path.find_last_of('/');
  std::string spec_default = slash == std::string::npos
      ? "io_spec.txt"  // model in the cwd
      : model_path.substr(0, slash) + "/io_spec.txt";
  IoSpec spec = ReadIoSpec(get("io_spec_path", spec_default));
  if (spec.input_types.size() != 3 || spec.input_dims.size() != 3)
    Die("io_spec.txt must describe exactly 3 inputs (noise, amps, seed); "
        "got " + std::to_string(spec.input_types.size()) +
        " — truncated or stale sidecar?");

  // the .bin artifact contract is single-output; a multi-output module
  // would make the plugin write past the 1-slot output list (the C API
  // cannot check this for us)
  {
    PJRT_LoadedExecutable_GetExecutable_Args ga;
    memset(&ga, 0, sizeof(ga));
    ga.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
    ga.loaded_executable = executable;
    Check(api, api->PJRT_LoadedExecutable_GetExecutable(&ga), "get executable");
    PJRT_Executable_NumOutputs_Args na;
    memset(&na, 0, sizeof(na));
    na.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
    na.executable = ga.executable;
    Check(api, api->PJRT_Executable_NumOutputs(&na), "num outputs");
    if (na.num_outputs != 1)
      Die("module has " + std::to_string(na.num_outputs) +
          " outputs; this runner's .bin contract is single-output");
  }

  // --- fixed inputs (amps, seed) loaded once
  auto amps_files = GetAllFiles(input1);
  auto seed_files = GetAllFiles(input2);
  if (amps_files.empty() || seed_files.empty())
    Die("missing noise_amps/seed bins");
  std::string amps_data = ReadFileToString(amps_files[0]);
  std::string seed_data = ReadFileToString(seed_files[0]);

  auto make_buffer = [&](const void* data, size_t size,
                         PJRT_Buffer_Type type,
                         const std::vector<int64_t>& dims) {
    // guard against stale/truncated .bin inputs: byte size must match the
    // io_spec shape (4-byte f32/s32 elements)
    int64_t expected = 4;
    for (int64_t d : dims) expected *= d;
    if (static_cast<int64_t>(size) != expected)
      Die("input size mismatch: got " + std::to_string(size) +
          " bytes, io_spec expects " + std::to_string(expected) +
          " — stale bins from a previous export/preprocess?");
    PJRT_Client_BufferFromHostBuffer_Args args;
    memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    args.extension_start = nullptr;
    args.client = client;
    args.data = data;
    args.type = type;
    args.dims = dims.data();
    args.num_dims = dims.size();
    args.byte_strides = nullptr;
    args.num_byte_strides = 0;
    args.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    args.device = device;
    Check(api, api->PJRT_Client_BufferFromHostBuffer(&args), "h2d");
    AwaitEvent(api, args.done_with_host_buffer, "h2d done");
    return args.buffer;
  };

  mkdir(output_dir.c_str(), 0755);
  mkdir("time_Result", 0755);

  auto input_files = GetAllFiles(input0);
  if (input_files.empty()) Die("no input bins in " + input0);
  double total_ms = 0;
  int runs = 0;

  // constant inputs upload ONCE, outside the timed loop — a serving loop
  // would never re-send them, and per-iteration re-uploads inflate the
  // reported latency
  PJRT_Buffer* in1 = make_buffer(amps_data.data(), amps_data.size(),
                                 spec.input_types[1], spec.input_dims[1]);
  PJRT_Buffer* in2 = make_buffer(seed_data.data(), seed_data.size(),
                                 spec.input_types[2], spec.input_dims[2]);

  // warmup executions excluded from the latency report (some PJRT plugins
  // defer final compilation to the first execute)
  int warmup = static_cast<int>(ParseI64(get("warmup", "1"), "--warmup"));
  std::vector<std::string> run_list;
  for (int i = 0; i < warmup; ++i) run_list.push_back(input_files[0]);
  for (const auto& f : input_files) run_list.push_back(f);
  int run_idx = 0;

  for (const auto& file : run_list) {
    bool is_warmup = run_idx++ < warmup;
    std::string noise = ReadFileToString(file);
    auto t0 = std::chrono::steady_clock::now();

    PJRT_Buffer* in0 = make_buffer(noise.data(), noise.size(),
                                   spec.input_types[0], spec.input_dims[0]);

    PJRT_Buffer* arg_list[3] = {in0, in1, in2};
    PJRT_Buffer* const* arg_lists[1] = {arg_list};
    PJRT_Buffer* out_list[1] = {nullptr};
    PJRT_Buffer** out_lists[1] = {out_list};
    PJRT_Event* device_complete[1] = {nullptr};

    PJRT_ExecuteOptions opts;
    memset(&opts, 0, sizeof(opts));
    opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
    opts.extension_start = nullptr;

    PJRT_LoadedExecutable_Execute_Args args;
    memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    args.extension_start = nullptr;
    args.executable = executable;
    args.options = &opts;
    args.argument_lists = arg_lists;
    args.num_devices = 1;
    args.num_args = 3;
    args.output_lists = out_lists;
    args.device_complete_events = device_complete;
    args.execute_device = device;
    Check(api, api->PJRT_LoadedExecutable_Execute(&args), "execute");
    AwaitEvent(api, device_complete[0], "execute done");

    // --- output to host
    PJRT_Buffer* out = out_list[0];
    // The output .bin contract is DENSE ROW-MAJOR (postprocess.py reshapes
    // NCHW/NCTHW). With host_layout null the plugin copies in the DEVICE
    // layout — on TPU that holds images H-minor (last two logical axes
    // transposed), which silently garbles every row-major consumer. Spell
    // out dense row-major byte strides explicitly — and do so BEFORE the
    // size query, so dst_size reflects the dense row-major layout rather
    // than a (possibly padded) device layout.
    PJRT_Buffer_Dimensions_Args bd;
    memset(&bd, 0, sizeof(bd));
    bd.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
    bd.buffer = out;
    Check(api, api->PJRT_Buffer_Dimensions(&bd), "output dims");
    // Row-major == last logical dim most minor: minor_to_major
    // {n-1, ..., 0}, no tiles. (Tiled, not Strides: PJRT plugins follow
    // jaxlib's ToLiteral path, which only passes Tiled layouts.)
    std::vector<int64_t> minor_to_major(bd.num_dims);
    for (size_t i = 0; i < bd.num_dims; ++i)
      minor_to_major[i] = static_cast<int64_t>(bd.num_dims - 1 - i);
    PJRT_Buffer_MemoryLayout layout;
    memset(&layout, 0, sizeof(layout));
    layout.struct_size = PJRT_Buffer_MemoryLayout_STRUCT_SIZE;
    layout.type = PJRT_Buffer_MemoryLayout_Type_Tiled;
    layout.tiled.struct_size = PJRT_Buffer_MemoryLayout_Tiled_STRUCT_SIZE;
    layout.tiled.minor_to_major = minor_to_major.data();
    layout.tiled.minor_to_major_size = minor_to_major.size();
    PJRT_Buffer_ToHostBuffer_Args th;
    memset(&th, 0, sizeof(th));
    th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    th.extension_start = nullptr;
    th.src = out;
    th.host_layout = &layout;
    th.dst = nullptr;  // size query (for the requested row-major layout)
    Check(api, api->PJRT_Buffer_ToHostBuffer(&th), "d2h size");
    std::vector<char> host(th.dst_size);
    th.dst = host.data();
    Check(api, api->PJRT_Buffer_ToHostBuffer(&th), "d2h");
    AwaitEvent(api, th.event, "d2h done");

    auto t1 = std::chrono::steady_clock::now();
    double ms =
        std::chrono::duration<double, std::milli>(t1 - t0).count();
    if (!is_warmup) {
      total_ms += ms;
      runs += 1;
      auto base = file.substr(file.find_last_of('/') + 1);
      base = base.substr(0, base.find_last_of('.'));
      WriteResult(output_dir + "/" + base + "_output_0.bin", host.data(),
                  host.size());
    }

    for (PJRT_Buffer* b : {in0, out}) {
      PJRT_Buffer_Destroy_Args d;
      d.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
      d.extension_start = nullptr;
      d.buffer = b;
      Check(api, api->PJRT_Buffer_Destroy(&d), "buffer destroy");
    }
    std::cerr << file << ": " << ms << " ms" << std::endl;
  }
  for (PJRT_Buffer* b : {in1, in2}) {
    PJRT_Buffer_Destroy_Args d;
    d.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
    d.extension_start = nullptr;
    d.buffer = b;
    Check(api, api->PJRT_Buffer_Destroy(&d), "buffer destroy");
  }

  // latency report (reference main.cc:127-143 contract)
  double avg = total_ms / runs;
  std::ofstream report("time_Result/test_perform_static.txt");
  report << "NN inference cost average time: " << avg
         << " ms of infer_count " << runs << std::endl;
  std::cout << "NN inference cost average time: " << avg
            << " ms of infer_count " << runs << std::endl;
  return 0;
}
