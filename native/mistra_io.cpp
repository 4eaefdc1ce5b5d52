// mistra_io: native asynchronous netCDF output runtime.
//
// Replaces the reference's synchronous Fortran netCDF stack
// (src/out_netCDF.f:30-4676 — one file per variable group, written from
// the model loop) with a C++ writer thread: the Python/JAX side hands a
// finished device->host snapshot to `mio_put_async`, which enqueues a
// copy and returns immediately; a background thread drains the queue
// into netCDF files via libnetcdf.  The model step never blocks on disk.
//
// libnetcdf is resolved with dlopen (the image ships libnetcdf.so.19 but
// no headers), so the handful of netCDF-C API entry points used are
// declared here verbatim from the public API.
//
// Build: make -C native  (produces native/libmistra_io.so)

#include <atomic>
#include <condition_variable>
#include <cstdarg>
#include <cstdint>
#include <cstring>
#include <deque>
#include <dlfcn.h>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

// ---------------------------------------------------------------------
// netCDF C API subset (public, stable since netCDF 3.x)
// ---------------------------------------------------------------------
extern "C" {
typedef int (*nc_create_t)(const char *, int, int *);
typedef int (*nc_open_t)(const char *, int, int *);
typedef int (*nc_def_dim_t)(int, const char *, size_t, int *);
typedef int (*nc_def_var_t)(int, const char *, int, int, const int *, int *);
typedef int (*nc_enddef_t)(int);
typedef int (*nc_close_t)(int);
typedef int (*nc_sync_t)(int);
typedef int (*nc_put_vara_double_t)(int, int, const size_t *, const size_t *,
                                    const double *);
typedef int (*nc_put_vara_float_t)(int, int, const size_t *, const size_t *,
                                   const float *);
typedef int (*nc_get_vara_double_t)(int, int, const size_t *, const size_t *,
                                    double *);
typedef int (*nc_put_att_text_t)(int, int, const char *, size_t, const char *);
typedef int (*nc_inq_varid_t)(int, const char *, int *);
typedef int (*nc_inq_dimlen_t)(int, int, size_t *);
typedef int (*nc_inq_dimid_t)(int, const char *, int *);
typedef const char *(*nc_strerror_t)(int);
}

#define NC_NOWRITE 0
#define NC_CLOBBER 0
#define NC_64BIT_OFFSET 0x0200
#define NC_GLOBAL (-1)
#define NC_UNLIMITED 0L
#define NC_FLOAT 5
#define NC_DOUBLE 6

namespace {

struct NcApi {
  void *lib = nullptr;
  nc_create_t create;
  nc_open_t open;
  nc_def_dim_t def_dim;
  nc_def_var_t def_var;
  nc_enddef_t enddef;
  nc_close_t close;
  nc_sync_t sync;
  nc_put_vara_double_t put_vara_double;
  nc_put_vara_float_t put_vara_float;
  nc_get_vara_double_t get_vara_double;
  nc_put_att_text_t put_att_text;
  nc_inq_varid_t inq_varid;
  nc_inq_dimid_t inq_dimid;
  nc_inq_dimlen_t inq_dimlen;
  nc_strerror_t strerror_;

  bool init() {
    if (lib) return true;
    const char *names[] = {"libnetcdf.so.19", "libnetcdf.so", "libnetcdf.so.18"};
    for (const char *n : names) {
      lib = dlopen(n, RTLD_NOW | RTLD_GLOBAL);
      if (lib) break;
    }
    if (!lib) return false;
#define LOAD(sym, field) \
  field = reinterpret_cast<decltype(field)>(dlsym(lib, sym)); \
  if (!field) return false;
    LOAD("nc_create", create)
    LOAD("nc_open", open)
    LOAD("nc_def_dim", def_dim)
    LOAD("nc_def_var", def_var)
    LOAD("nc_enddef", enddef)
    LOAD("nc_close", close)
    LOAD("nc_sync", sync)
    LOAD("nc_put_vara_double", put_vara_double)
    LOAD("nc_put_vara_float", put_vara_float)
    LOAD("nc_get_vara_double", get_vara_double)
    LOAD("nc_put_att_text", put_att_text)
    LOAD("nc_inq_varid", inq_varid)
    LOAD("nc_inq_dimid", inq_dimid)
    LOAD("nc_inq_dimlen", inq_dimlen)
    LOAD("nc_strerror", strerror_)
#undef LOAD
    return true;
  }
};

NcApi g_nc;
std::mutex g_api_mutex;

bool api_ok() {
  std::lock_guard<std::mutex> lk(g_api_mutex);
  return g_nc.init();
}

// One queued write: put_vara of a contiguous double block.
struct WriteJob {
  int ncid;
  int varid;
  std::vector<size_t> start;
  std::vector<size_t> count;
  std::vector<double> data;   // owned copy
  bool sync_after = false;
};

// The writer: single background thread, bounded queue (back-pressure by
// blocking the producer once `max_bytes` of snapshots are in flight —
// the model runs minutes of simulation per snapshot, so in practice the
// queue never fills).
class AsyncWriter {
 public:
  explicit AsyncWriter(size_t max_bytes = size_t(1) << 30)
      : max_bytes_(max_bytes), bytes_(0), stop_(false), error_(0) {
    thread_ = std::thread([this] { this->run(); });
  }

  ~AsyncWriter() { shutdown(); }

  void shutdown() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      if (stop_) return;
      stop_ = true;
    }
    cv_.notify_all();
    if (thread_.joinable()) thread_.join();
  }

  void enqueue(WriteJob &&job) {
    std::unique_lock<std::mutex> lk(mu_);
    size_t nb = job.data.size() * sizeof(double);
    cv_space_.wait(lk, [&] { return bytes_ + nb <= max_bytes_ || stop_; });
    if (stop_) return;
    bytes_ += nb;
    queue_.emplace_back(std::move(job));
    cv_.notify_one();
  }

  // Block until everything queued so far has been written.
  void drain() {
    std::unique_lock<std::mutex> lk(mu_);
    cv_space_.wait(lk, [&] { return queue_.empty() && !busy_; });
  }

  int error() const { return error_.load(); }
  size_t pending_bytes() {
    std::lock_guard<std::mutex> lk(mu_);
    return bytes_;
  }

 private:
  void run() {
    for (;;) {
      WriteJob job;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [&] { return stop_ || !queue_.empty(); });
        if (queue_.empty()) {
          if (stop_) return;
          continue;
        }
        job = std::move(queue_.front());
        queue_.pop_front();
        busy_ = true;
      }
      int st = g_nc.put_vara_double(job.ncid, job.varid, job.start.data(),
                                    job.count.data(), job.data.data());
      if (st == 0 && job.sync_after) st = g_nc.sync(job.ncid);
      if (st != 0) error_.store(st);
      {
        std::lock_guard<std::mutex> lk(mu_);
        bytes_ -= job.data.size() * sizeof(double);
        busy_ = false;
      }
      cv_space_.notify_all();
    }
  }

  size_t max_bytes_;
  size_t bytes_;
  bool busy_ = false;
  bool stop_;
  std::atomic<int> error_;
  std::deque<WriteJob> queue_;
  std::mutex mu_;
  std::condition_variable cv_;
  std::condition_variable cv_space_;
  std::thread thread_;
};

AsyncWriter *g_writer = nullptr;
std::mutex g_writer_mutex;

AsyncWriter *writer() {
  std::lock_guard<std::mutex> lk(g_writer_mutex);
  if (!g_writer) g_writer = new AsyncWriter();
  return g_writer;
}

}  // namespace

// ---------------------------------------------------------------------
// exported C API (consumed from Python via ctypes; mistra_tpu/io/netcdf.py)
// ---------------------------------------------------------------------
extern "C" {

int mio_available() { return api_ok() ? 1 : 0; }

const char *mio_strerror(int status) {
  if (!api_ok()) return "libnetcdf unavailable";
  return g_nc.strerror_(status);
}

// --- definition phase (synchronous; cheap, happens once per run) -------
int mio_create(const char *path, int *ncid) {
  if (!api_ok()) return -999;
  return g_nc.create(path, NC_CLOBBER | NC_64BIT_OFFSET, ncid);
}

int mio_open(const char *path, int *ncid) {
  if (!api_ok()) return -999;
  return g_nc.open(path, NC_NOWRITE, ncid);
}

int mio_def_dim(int ncid, const char *name, long long len, int *dimid) {
  // len < 0 -> unlimited record dimension
  return g_nc.def_dim(ncid, name, len < 0 ? NC_UNLIMITED : (size_t)len,
                      dimid);
}

int mio_def_var(int ncid, const char *name, int ndims, const int *dimids,
                int *varid) {
  return g_nc.def_var(ncid, name, NC_DOUBLE, ndims, dimids, varid);
}

int mio_put_att(int ncid, int varid, const char *name, const char *text) {
  return g_nc.put_att_text(ncid, varid, name, strlen(text), text);
}

int mio_enddef(int ncid) { return g_nc.enddef(ncid); }

int mio_inq_varid(int ncid, const char *name, int *varid) {
  return g_nc.inq_varid(ncid, name, varid);
}

int mio_inq_dimlen(int ncid, const char *name, long long *len) {
  int dimid, st = g_nc.inq_dimid(ncid, name, &dimid);
  if (st != 0) return st;
  size_t l;
  st = g_nc.inq_dimlen(ncid, dimid, &l);
  *len = (long long)l;
  return st;
}

// --- data phase ---------------------------------------------------------
// Asynchronous: copies `data` and returns; the writer thread performs the
// netCDF put.  Any failure surfaces through mio_drain/mio_error.
int mio_put_async(int ncid, int varid, int ndims, const long long *start,
                  const long long *count, const double *data) {
  if (!api_ok()) return -999;
  WriteJob job;
  job.ncid = ncid;
  job.varid = varid;
  size_t total = 1;
  for (int i = 0; i < ndims; ++i) {
    job.start.push_back((size_t)start[i]);
    job.count.push_back((size_t)count[i]);
    total *= (size_t)count[i];
  }
  job.data.assign(data, data + total);
  writer()->enqueue(std::move(job));
  return 0;
}

// Synchronous put (definition-time constants, small arrays).
int mio_put(int ncid, int varid, int ndims, const long long *start,
            const long long *count, const double *data) {
  if (!api_ok()) return -999;
  std::vector<size_t> s(ndims), c(ndims);
  for (int i = 0; i < ndims; ++i) {
    s[i] = (size_t)start[i];
    c[i] = (size_t)count[i];
  }
  return g_nc.put_vara_double(ncid, varid, s.data(), c.data(), data);
}

int mio_get(int ncid, int varid, int ndims, const long long *start,
            const long long *count, double *data) {
  if (!api_ok()) return -999;
  std::vector<size_t> s(ndims), c(ndims);
  for (int i = 0; i < ndims; ++i) {
    s[i] = (size_t)start[i];
    c[i] = (size_t)count[i];
  }
  return g_nc.get_vara_double(ncid, varid, s.data(), c.data(), data);
}

// Wait for all queued writes to land on disk; returns first error (0 = ok).
int mio_drain() {
  writer()->drain();
  return writer()->error();
}

long long mio_pending_bytes() {
  return (long long)writer()->pending_bytes();
}

int mio_close(int ncid) {
  writer()->drain();
  int werr = writer()->error();
  int cerr = g_nc.close(ncid);
  return werr != 0 ? werr : cerr;
}

}  // extern "C"
