// Native g2o text parser (role of the reference's Rust loader, g2o.rs:35-143).
//
// Single pass over a fully-read buffer with locale-independent
// std::from_chars numeric conversion (bit-identical to Python's float()),
// producing the same struct-of-arrays layout as the Python parser in
// rustrobotics_tpu/mapping/g2o.py: nodes/edges grouped by type with
// type-local int32 index arrays, file-order dof offsets, gauge-prior node
// from the first EDGE_SE2 / EDGE_SE3:QUAT, quaternions reordered to
// [w, x, y, z] (the reference's wxyz/xyzw mixup, g2o.rs:18-22, is NOT
// reproduced).
//
// C ABI (ctypes): g2o_parse fills a counts header and returns an opaque
// handle; g2o_fill copies the arrays into caller-allocated numpy buffers;
// g2o_free releases the handle. Any parse error (unknown tag, malformed
// number, short record) returns a null handle with counts[9] != 0 — the
// Python side then falls back to the pure-Python parser, which raises the
// canonical error.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <charconv>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct G2OData {
  std::vector<double> poses2, landmarks2, poses3;
  std::vector<int64_t> pp_from_id, pp_to_id, pl_pose_id, pl_lm_id,
      qq_from_id, qq_to_id;
  std::vector<double> pp_z, pp_omega, pl_z, pl_omega, qq_z, qq_omega;
  std::vector<int32_t> p2_off, l2_off, p3_off;
  std::vector<int64_t> pp_fi, pl_fi, qq_fi;
  std::vector<int32_t> pp_from, pp_to, pl_pose, pl_lm, qq_from, qq_to;
  std::unordered_map<int64_t, int32_t> pose2_ids, lm2_ids, pose3_ids;
  int64_t total_dof = 0;
  int64_t prior2 = -1, prior3 = -1;  // type-local row index (or -1)
};

inline void skip_ws(const char*& p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
}

inline bool token(const char*& p, const char* end, const char*& tok_begin,
                  const char*& tok_end) {
  skip_ws(p, end);
  if (p >= end || *p == '\n') return false;
  tok_begin = p;
  while (p < end && *p != ' ' && *p != '\t' && *p != '\r' && *p != '\n') ++p;
  tok_end = p;
  return true;
}

inline bool parse_i64(const char*& p, const char* end, int64_t& out) {
  const char *b, *e;
  if (!token(p, end, b, e)) return false;
  auto r = std::from_chars(b, e, out);
  return r.ec == std::errc() && r.ptr == e;
}

inline bool parse_f64(const char*& p, const char* end, double& out) {
  const char *b, *e;
  if (!token(p, end, b, e)) return false;
  auto r = std::from_chars(b, e, out);
  return r.ec == std::errc() && r.ptr == e;
}

bool resolve(const std::unordered_map<int64_t, int32_t>& ids,
             const std::vector<int64_t>& raw, std::vector<int32_t>& out) {
  out.resize(raw.size());
  for (size_t i = 0; i < raw.size(); ++i) {
    auto it = ids.find(raw[i]);
    if (it == ids.end()) return false;
    out[i] = it->second;
  }
  return true;
}

}  // namespace

extern "C" {

// counts: [n2, l2, n3, e_pp, e_pl, e_qq, total_dof, prior2, prior3, status]
void* g2o_parse(const char* path, int64_t* counts) {
  counts[9] = 1;  // pessimistic
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::string buf;
  buf.resize(static_cast<size_t>(size));
  if (size > 0 && std::fread(&buf[0], 1, static_cast<size_t>(size), f) !=
                      static_cast<size_t>(size)) {
    std::fclose(f);
    return nullptr;
  }
  std::fclose(f);

  auto* d = new G2OData();
  const char* p = buf.data();
  const char* end = p + buf.size();
  int64_t prior2_id = -1, prior3_id = -1;
  bool have_prior2 = false, have_prior3 = false;
  int64_t edge_file_index = 0;
  bool ok = true;

  while (p < end && ok) {
    const char *tb, *te;
    if (!token(p, end, tb, te)) {  // blank line
      if (p < end && *p == '\n') ++p;
      continue;
    }
    size_t tlen = static_cast<size_t>(te - tb);
    if (tlen == 10 && std::memcmp(tb, "VERTEX_SE2", 10) == 0) {
      int64_t id;
      double v[3];
      ok = parse_i64(p, end, id) && parse_f64(p, end, v[0]) &&
           parse_f64(p, end, v[1]) && parse_f64(p, end, v[2]);
      if (!ok) break;
      d->pose2_ids[id] = static_cast<int32_t>(d->poses2.size() / 3);
      d->poses2.insert(d->poses2.end(), v, v + 3);
      d->p2_off.push_back(static_cast<int32_t>(d->total_dof));
      d->total_dof += 3;
    } else if (tlen == 9 && std::memcmp(tb, "VERTEX_XY", 9) == 0) {
      int64_t id;
      double v[2];
      ok = parse_i64(p, end, id) && parse_f64(p, end, v[0]) &&
           parse_f64(p, end, v[1]);
      if (!ok) break;
      d->lm2_ids[id] = static_cast<int32_t>(d->landmarks2.size() / 2);
      d->landmarks2.insert(d->landmarks2.end(), v, v + 2);
      d->l2_off.push_back(static_cast<int32_t>(d->total_dof));
      d->total_dof += 2;
    } else if (tlen == 15 && std::memcmp(tb, "VERTEX_SE3:QUAT", 15) == 0) {
      int64_t id;
      double v[7];  // x y z qx qy qz qw
      ok = parse_i64(p, end, id);
      for (int k = 0; ok && k < 7; ++k) ok = parse_f64(p, end, v[k]);
      if (!ok) break;
      d->pose3_ids[id] = static_cast<int32_t>(d->poses3.size() / 7);
      double w[7] = {v[0], v[1], v[2], v[6], v[3], v[4], v[5]};  // -> wxyz
      d->poses3.insert(d->poses3.end(), w, w + 7);
      d->p3_off.push_back(static_cast<int32_t>(d->total_dof));
      d->total_dof += 6;
    } else if (tlen == 8 && std::memcmp(tb, "EDGE_SE2", 8) == 0) {
      int64_t fid, tid;
      double v[9];  // x y th i11 i12 i13 i22 i23 i33
      ok = parse_i64(p, end, fid) && parse_i64(p, end, tid);
      for (int k = 0; ok && k < 9; ++k) ok = parse_f64(p, end, v[k]);
      if (!ok) break;
      d->pp_from_id.push_back(fid);
      d->pp_to_id.push_back(tid);
      d->pp_z.insert(d->pp_z.end(), v, v + 3);
      double om[9] = {v[3], v[4], v[5], v[4], v[6], v[7], v[5], v[7], v[8]};
      d->pp_omega.insert(d->pp_omega.end(), om, om + 9);
      if (!have_prior2) {
        prior2_id = fid;
        have_prior2 = true;
      }
      d->pp_fi.push_back(edge_file_index++);
    } else if (tlen == 11 && std::memcmp(tb, "EDGE_SE2_XY", 11) == 0) {
      int64_t fid, tid;
      double v[5];  // x y i11 i12 i22
      ok = parse_i64(p, end, fid) && parse_i64(p, end, tid);
      for (int k = 0; ok && k < 5; ++k) ok = parse_f64(p, end, v[k]);
      if (!ok) break;
      d->pl_pose_id.push_back(fid);
      d->pl_lm_id.push_back(tid);
      d->pl_z.insert(d->pl_z.end(), v, v + 2);
      double om[4] = {v[2], v[3], v[3], v[4]};
      d->pl_omega.insert(d->pl_omega.end(), om, om + 4);
      d->pl_fi.push_back(edge_file_index++);
    } else if (tlen == 13 && std::memcmp(tb, "EDGE_SE3:QUAT", 13) == 0) {
      int64_t fid, tid;
      double m[7];   // x y z qx qy qz qw
      double u[21];  // row-major upper triangle of the 6x6 information
      ok = parse_i64(p, end, fid) && parse_i64(p, end, tid);
      for (int k = 0; ok && k < 7; ++k) ok = parse_f64(p, end, m[k]);
      for (int k = 0; ok && k < 21; ++k) ok = parse_f64(p, end, u[k]);
      if (!ok) break;
      d->qq_from_id.push_back(fid);
      d->qq_to_id.push_back(tid);
      double z[7] = {m[0], m[1], m[2], m[6], m[3], m[4], m[5]};  // -> wxyz
      d->qq_z.insert(d->qq_z.end(), z, z + 7);
      double om[36];
      int k = 0;
      for (int i = 0; i < 6; ++i)
        for (int j = i; j < 6; ++j) {
          om[i * 6 + j] = u[k];
          om[j * 6 + i] = u[k];
          ++k;
        }
      d->qq_omega.insert(d->qq_omega.end(), om, om + 36);
      if (!have_prior3) {
        prior3_id = fid;
        have_prior3 = true;
      }
      d->qq_fi.push_back(edge_file_index++);
    } else {
      ok = false;  // unknown record kind -> Python fallback raises
      break;
    }
    skip_ws(p, end);
    if (p < end) {
      if (*p != '\n') {  // trailing junk on the line
        ok = false;
        break;
      }
      ++p;
    }
  }

  if (ok) {
    ok = resolve(d->pose2_ids, d->pp_from_id, d->pp_from) &&
         resolve(d->pose2_ids, d->pp_to_id, d->pp_to) &&
         resolve(d->pose2_ids, d->pl_pose_id, d->pl_pose) &&
         resolve(d->lm2_ids, d->pl_lm_id, d->pl_lm) &&
         resolve(d->pose3_ids, d->qq_from_id, d->qq_from) &&
         resolve(d->pose3_ids, d->qq_to_id, d->qq_to);
  }
  if (!ok) {
    delete d;
    return nullptr;
  }
  if (have_prior2) {
    auto it = d->pose2_ids.find(prior2_id);
    d->prior2 = (it == d->pose2_ids.end()) ? -1 : it->second;
  }
  if (have_prior3) {
    auto it = d->pose3_ids.find(prior3_id);
    d->prior3 = (it == d->pose3_ids.end()) ? -1 : it->second;
  }
  counts[0] = static_cast<int64_t>(d->poses2.size() / 3);
  counts[1] = static_cast<int64_t>(d->landmarks2.size() / 2);
  counts[2] = static_cast<int64_t>(d->poses3.size() / 7);
  counts[3] = static_cast<int64_t>(d->pp_from.size());
  counts[4] = static_cast<int64_t>(d->pl_pose.size());
  counts[5] = static_cast<int64_t>(d->qq_from.size());
  counts[6] = d->total_dof;
  counts[7] = d->prior2;
  counts[8] = d->prior3;
  counts[9] = 0;
  return d;
}

void g2o_fill(void* handle, double* poses2, double* landmarks2, double* poses3,
              int32_t* pp_from, int32_t* pp_to, double* pp_z, double* pp_omega,
              int32_t* pl_pose, int32_t* pl_lm, double* pl_z, double* pl_omega,
              int32_t* qq_from, int32_t* qq_to, double* qq_z, double* qq_omega,
              int32_t* p2_off, int32_t* l2_off, int32_t* p3_off,
              int64_t* pp_fi, int64_t* pl_fi, int64_t* qq_fi) {
  auto* d = static_cast<G2OData*>(handle);
  auto cpy = [](auto* dst, const auto& src) {
    if (!src.empty())
      std::memcpy(dst, src.data(), src.size() * sizeof(src[0]));
  };
  cpy(poses2, d->poses2);
  cpy(landmarks2, d->landmarks2);
  cpy(poses3, d->poses3);
  cpy(pp_from, d->pp_from);
  cpy(pp_to, d->pp_to);
  cpy(pp_z, d->pp_z);
  cpy(pp_omega, d->pp_omega);
  cpy(pl_pose, d->pl_pose);
  cpy(pl_lm, d->pl_lm);
  cpy(pl_z, d->pl_z);
  cpy(pl_omega, d->pl_omega);
  cpy(qq_from, d->qq_from);
  cpy(qq_to, d->qq_to);
  cpy(qq_z, d->qq_z);
  cpy(qq_omega, d->qq_omega);
  cpy(p2_off, d->p2_off);
  cpy(l2_off, d->l2_off);
  cpy(p3_off, d->p3_off);
  cpy(pp_fi, d->pp_fi);
  cpy(pl_fi, d->pl_fi);
  cpy(qq_fi, d->qq_fi);
}

void g2o_free(void* handle) { delete static_cast<G2OData*>(handle); }

}  // extern "C"
