#include "rbd.hpp"

namespace indy7 {

namespace {

Vec3 cross(const Vec3& a, const Vec3& b) {
  return {a[1] * b[2] - a[2] * b[1], a[2] * b[0] - a[0] * b[2],
          a[0] * b[1] - a[1] * b[0]};
}

Vec3 add(const Vec3& a, const Vec3& b) {
  return {a[0] + b[0], a[1] + b[1], a[2] + b[2]};
}

Vec3 sub(const Vec3& a, const Vec3& b) {
  return {a[0] - b[0], a[1] - b[1], a[2] - b[2]};
}

Vec3 scale(double s, const Vec3& a) { return {s * a[0], s * a[1], s * a[2]}; }

double dot(const Vec3& a, const Vec3& b) {
  return a[0] * b[0] + a[1] * b[1] + a[2] * b[2];
}

Vec3 mv(const Mat3& M, const Vec3& a) {
  Vec3 r;
  for (int i = 0; i < 3; ++i)
    r[i] = M[i][0] * a[0] + M[i][1] * a[1] + M[i][2] * a[2];
  return r;
}

Vec3 mtv(const Mat3& M, const Vec3& a) {
  Vec3 r;
  for (int i = 0; i < 3; ++i)
    r[i] = M[0][i] * a[0] + M[1][i] * a[1] + M[2][i] * a[2];
  return r;
}

Mat3 mm(const Mat3& A, const Mat3& B) {
  Mat3 r{};
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      r[i][j] = 0;
      for (int k = 0; k < 3; ++k) r[i][j] += A[i][k] * B[k][j];
    }
  return r;
}

Mat3 rot_axis(const Vec3& axis, double q) {
  const double c = std::cos(q), s = std::sin(q), oc = 1.0 - c;
  const double x = axis[0], y = axis[1], z = axis[2];
  return {{{c + x * x * oc, x * y * oc - z * s, x * z * oc + y * s},
           {y * x * oc + z * s, c + y * y * oc, y * z * oc - x * s},
           {z * x * oc - y * s, z * y * oc + x * s, c + z * z * oc}}};
}

// Inertia about the joint origin: I_o = I_c + m (c.c I - c c^T).
Mat3 inertia_about_origin(double m, const Vec3& c, const Mat3& I_c) {
  Mat3 r = I_c;
  const double cc = dot(c, c);
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j)
      r[i][j] += m * ((i == j ? cc : 0.0) - c[i] * c[j]);
  return r;
}

struct Placement {
  Mat3 R;
  Vec3 p;
};

void local_placements(const Model& m, const VecJ& q, Placement out[NJ]) {
  for (int i = 0; i < NJ; ++i) {
    out[i].R = mm(m.tree_R[i], rot_axis(m.axis[i], q[i]));
    out[i].p = m.tree_p[i];
  }
}

}  // namespace

void forward_kinematics(const Model& m, const VecJ& q, Mat3 R_w[NJ],
                        Vec3 p_w[NJ]) {
  Placement loc[NJ];
  local_placements(m, q, loc);
  for (int i = 0; i < NJ; ++i) {
    if (i == 0) {
      R_w[0] = loc[0].R;
      p_w[0] = loc[0].p;
    } else {
      p_w[i] = add(p_w[i - 1], mv(R_w[i - 1], loc[i].p));
      R_w[i] = mm(R_w[i - 1], loc[i].R);
    }
  }
}

Vec3 ee_position(const Model& m, const VecJ& q) {
  Mat3 R_w[NJ];
  Vec3 p_w[NJ];
  forward_kinematics(m, q, R_w, p_w);
  return p_w[NJ - 1];
}

Vec6 world_wrench_to_ee(const Model& m, const VecJ& q, const Vec6& w) {
  Mat3 R_w[NJ];
  Vec3 p_w[NJ];
  forward_kinematics(m, q, R_w, p_w);
  const Mat3& R = R_w[NJ - 1];
  const Vec3& p = p_w[NJ - 1];
  const Vec3 f = {w[0], w[1], w[2]};
  const Vec3 n = {w[3], w[4], w[5]};
  const Vec3 f_l = mtv(R, f);
  const Vec3 n_l = mtv(R, sub(n, cross(p, f)));
  return {f_l[0], f_l[1], f_l[2], n_l[0], n_l[1], n_l[2]};
}

VecJ rnea(const Model& m, const VecJ& q, const VecJ& v, const VecJ& a,
          const Vec6* f_ext_ee, bool gravity) {
  Placement loc[NJ];
  local_placements(m, q, loc);

  Vec3 v_lin[NJ], v_ang[NJ], f_lin[NJ], f_ang[NJ];
  Vec3 vp_lin{0, 0, 0}, vp_ang{0, 0, 0};
  Vec3 ap_lin = gravity ? scale(-1.0, m.gravity) : Vec3{0, 0, 0};
  Vec3 ap_ang{0, 0, 0};

  for (int i = 0; i < NJ; ++i) {
    const Mat3& R = loc[i].R;
    const Vec3& p = loc[i].p;
    const Vec3& ax = m.axis[i];

    Vec3 wi = mtv(R, vp_ang);
    Vec3 vi = mtv(R, add(vp_lin, cross(vp_ang, p)));
    const Vec3 vJ = scale(v[i], ax);
    wi = add(wi, vJ);

    Vec3 ai_ang = mtv(R, ap_ang);
    Vec3 ai_lin = mtv(R, add(ap_lin, cross(ap_ang, p)));
    ai_ang = add(ai_ang, add(scale(a[i], ax), cross(wi, vJ)));
    ai_lin = add(ai_lin, cross(vi, vJ));

    const double mi = m.mass[i];
    const Vec3 h = scale(mi, m.com[i]);
    const Mat3 I_o = inertia_about_origin(mi, m.com[i], m.I_com[i]);
    const Vec3 Iv_lin = sub(scale(mi, vi), cross(h, wi));
    const Vec3 Iv_ang = add(mv(I_o, wi), cross(h, vi));
    const Vec3 Ia_lin = sub(scale(mi, ai_lin), cross(h, ai_ang));
    const Vec3 Ia_ang = add(mv(I_o, ai_ang), cross(h, ai_lin));
    Vec3 fi_lin = add(Ia_lin, cross(wi, Iv_lin));
    Vec3 fi_ang = add(Ia_ang, add(cross(wi, Iv_ang), cross(vi, Iv_lin)));

    if (f_ext_ee && i == NJ - 1) {
      fi_lin = sub(fi_lin, {(*f_ext_ee)[0], (*f_ext_ee)[1], (*f_ext_ee)[2]});
      fi_ang = sub(fi_ang, {(*f_ext_ee)[3], (*f_ext_ee)[4], (*f_ext_ee)[5]});
    }

    v_lin[i] = vi;
    v_ang[i] = wi;
    f_lin[i] = fi_lin;
    f_ang[i] = fi_ang;
    vp_lin = vi;
    vp_ang = wi;
    ap_lin = ai_lin;
    ap_ang = ai_ang;
  }

  VecJ tau;
  for (int i = NJ - 1; i >= 0; --i) {
    tau[i] = dot(f_ang[i], m.axis[i]);
    if (i > 0) {
      const Mat3& R = loc[i].R;
      const Vec3& p = loc[i].p;
      const Vec3 fp = mv(R, f_lin[i]);
      const Vec3 np = add(mv(R, f_ang[i]), cross(p, fp));
      f_lin[i - 1] = add(f_lin[i - 1], fp);
      f_ang[i - 1] = add(f_ang[i - 1], np);
    }
  }
  return tau;
}

MatJ crba(const Model& m, const VecJ& q) {
  Placement loc[NJ];
  local_placements(m, q, loc);

  double cm[NJ];
  Vec3 ch[NJ];
  Mat3 cI[NJ];
  for (int i = 0; i < NJ; ++i) {
    cm[i] = m.mass[i];
    ch[i] = scale(m.mass[i], m.com[i]);
    cI[i] = inertia_about_origin(m.mass[i], m.com[i], m.I_com[i]);
  }
  for (int i = NJ - 1; i > 0; --i) {
    const Mat3& R = loc[i].R;
    const Vec3& p = loc[i].p;
    const double mi = cm[i];
    const Vec3 c = scale(1.0 / mi, ch[i]);
    const Vec3 c_new = add(mv(R, c), p);
    // Remove the parallel-axis term, rotate, re-add about the new origin.
    Mat3 I_c = cI[i];
    {
      const double cc = dot(c, c);
      for (int a = 0; a < 3; ++a)
        for (int b = 0; b < 3; ++b)
          I_c[a][b] -= mi * ((a == b ? cc : 0.0) - c[a] * c[b]);
    }
    Mat3 Rt;
    for (int a = 0; a < 3; ++a)
      for (int b = 0; b < 3; ++b) Rt[a][b] = R[b][a];
    Mat3 I_cn = mm(mm(R, I_c), Rt);
    {
      const double cc = dot(c_new, c_new);
      for (int a = 0; a < 3; ++a)
        for (int b = 0; b < 3; ++b)
          I_cn[a][b] += mi * ((a == b ? cc : 0.0) - c_new[a] * c_new[b]);
    }
    cm[i - 1] += mi;
    ch[i - 1] = add(ch[i - 1], scale(mi, c_new));
    for (int a = 0; a < 3; ++a)
      for (int b = 0; b < 3; ++b) cI[i - 1][a][b] += I_cn[a][b];
  }

  MatJ M{};
  for (int i = 0; i < NJ; ++i) {
    Vec3 F_lin = scale(-1.0, cross(ch[i], m.axis[i]));
    Vec3 F_ang = mv(cI[i], m.axis[i]);
    M[i][i] = dot(F_ang, m.axis[i]);
    int j = i;
    while (j > 0) {
      const Mat3& R = loc[j].R;
      const Vec3& p = loc[j].p;
      const Vec3 fl = mv(R, F_lin);
      const Vec3 fa = add(mv(R, F_ang), cross(p, fl));
      F_lin = fl;
      F_ang = fa;
      --j;
      M[i][j] = dot(F_ang, m.axis[j]);
      M[j][i] = M[i][j];
    }
  }
  return M;
}

VecJ forward_dynamics(const Model& m, const VecJ& q, const VecJ& v,
                      const VecJ& tau, const Vec6* f_ext_ee) {
  const VecJ bias = rnea(m, q, v, VecJ{}, f_ext_ee, true);
  const MatJ M = crba(m, q);

  // LDL^T factorization (no pivoting; M is SPD).
  MatJ L{};
  VecJ D{}, invD{};
  for (int j = 0; j < NJ; ++j) {
    double s = M[j][j];
    for (int k = 0; k < j; ++k) s -= L[j][k] * L[j][k] * D[k];
    D[j] = s;
    invD[j] = 1.0 / s;
    for (int i = j + 1; i < NJ; ++i) {
      double t = M[i][j];
      for (int k = 0; k < j; ++k) t -= L[i][k] * L[j][k] * D[k];
      L[i][j] = t * invD[j];
    }
  }
  VecJ b;
  for (int i = 0; i < NJ; ++i) b[i] = tau[i] - bias[i];
  VecJ y;
  for (int i = 0; i < NJ; ++i) {
    double s = b[i];
    for (int k = 0; k < i; ++k) s -= L[i][k] * y[k];
    y[i] = s;
  }
  VecJ x;
  for (int i = NJ - 1; i >= 0; --i) {
    double s = y[i] * invD[i];
    for (int k = i + 1; k < NJ; ++k) s -= L[k][i] * x[k];
    x[i] = s;
  }
  return x;
}

State rk4_step(const Model& m, const State& x, const VecJ& u, double dt,
               const Vec6* wrench_world, const Friction* friction) {
  VecJ q, v;
  for (int i = 0; i < NJ; ++i) {
    q[i] = x[i];
    v[i] = x[NJ + i];
  }
  Vec6 fl{};
  const Vec6* fp = nullptr;
  if (wrench_world) {
    fl = world_wrench_to_ee(m, q, *wrench_world);
    fp = &fl;
  }
  auto fd = [&](const VecJ& qq, const VecJ& vv) {
    if (friction) {
      VecJ ue;
      for (int i = 0; i < NJ; ++i)
        ue[i] = u[i] - friction->kv * vv[i] -
                friction->kc * std::tanh(vv[i] / 0.01);
      return forward_dynamics(m, qq, vv, ue, fp);
    }
    return forward_dynamics(m, qq, vv, u, fp);
  };
  auto axpy = [](const VecJ& a, double s, const VecJ& b) {
    VecJ r;
    for (int i = 0; i < NJ; ++i) r[i] = a[i] + s * b[i];
    return r;
  };

  const VecJ k1q = v;
  const VecJ k1v = fd(q, v);
  const VecJ q2 = axpy(q, dt / 2, k1q);
  const VecJ k2q = axpy(v, dt / 2, k1v);
  const VecJ k2v = fd(q2, k2q);
  const VecJ q3 = axpy(q, dt / 2, k2q);
  const VecJ k3q = axpy(v, dt / 2, k2v);
  const VecJ k3v = fd(q3, k3q);
  const VecJ q4 = axpy(q, dt, k3q);
  const VecJ k4q = axpy(v, dt, k3v);
  const VecJ k4v = fd(q4, k4q);

  State out;
  for (int i = 0; i < NJ; ++i) {
    const double avg_q = (k1q[i] + 2 * k2q[i] + 2 * k3q[i] + k4q[i]) / 6.0;
    out[i] = q[i] + dt * avg_q;
    out[NJ + i] =
        v[i] + dt / 6.0 * (k1v[i] + 2 * k2v[i] + 2 * k3v[i] + k4v[i]);
  }
  return out;
}

void apply_joint_limits(const Model& m, State& x, bool saturate_velocity) {
  for (int i = 0; i < NJ; ++i) {
    double q = x[i], v = x[NJ + i];
    if (saturate_velocity) {
      const double vl = m.velocity_limit[i];
      if (v > vl) v = vl;
      if (v < -vl) v = -vl;
    }
    if (q > m.q_upper[i]) {
      q = m.q_upper[i];
      if (v > 0.0) v = 0.0;
    } else if (q < m.q_lower[i]) {
      q = m.q_lower[i];
      if (v < 0.0) v = 0.0;
    }
    x[i] = q;
    x[NJ + i] = v;
  }
}

namespace {
unsigned long long splitmix64_out(unsigned long long z) {
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
  return z ^ (z >> 31);
}
}  // namespace

void perturb_model(Model& m, double pct, unsigned long long seed) {
  if (pct == 0.0) return;
  // Draw order matches sim/plant.py perturbation_scales: NJ mass scales
  // first, then NJ inertia scales.
  double draws[2 * NJ];
  unsigned long long state = seed;
  for (int i = 0; i < 2 * NJ; ++i) {
    state += 0x9E3779B97F4A7C15ULL;
    const unsigned long long u53 = splitmix64_out(state) >> 11;
    draws[i] = 2.0 * (static_cast<double>(u53) * 0x1.0p-53) - 1.0;
  }
  for (int i = 0; i < NJ; ++i) {
    m.mass[i] *= 1.0 + pct * draws[i];
    const double s = 1.0 + pct * draws[NJ + i];
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) m.I_com[i][r][c] *= s;
  }
}

}  // namespace indy7
