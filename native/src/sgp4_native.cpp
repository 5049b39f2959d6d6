// Native SGP4 (near-earth) propagator + observer geometry.
//
// The reference consumed C libgpredict for orbital propagation (SURVEY §2
// #9); this is the framework's native-speed equivalent for the host
// scheduling path: at pod scale (hundreds of channels × per-block schedules)
// the Doppler curve evaluation is the dominant host cost, and this C++ path
// evaluates a full curve two orders of magnitude faster than Python.
//
// Algorithm: standard near-earth SGP4, Spacetrack Report #3 with the
// corrections consolidated in Vallado et al. 2006, WGS-72 constants —
// intentionally the same math as doppler_tpu/orbit/sgp4.py so the two
// implementations cross-validate each other bit-tightly (tests/test_native_sgp4.py).
// Deep-space (SDP4) stays in Python (orbit/deepspace.py): it is O(unique
// seconds), never the bottleneck.
//
// Exposed C ABI (ctypes):
//   dt_sgp4_init(elements[10], ctx_out[64])          -> 0 ok / <0 error
//   dt_sgp4_propagate(ctx, t_min[], n, r_km[], v_kms[]) -> 0 ok / <0 error
//   dt_doppler_curve(ctx, epoch_jd, lat,lon,alt, unix_s[], n, freq_hz,
//                    doppler_hz[], range_km[], range_rate[], az[], el[])

#include <cmath>
#include <cstddef>
#include <cstdint>

namespace {

constexpr double kPi = 3.14159265358979323846;
constexpr double kTwoPi = 2.0 * kPi;
// WGS-72
constexpr double kMu = 398600.8;
constexpr double kRe = 6378.135;
constexpr double kJ2 = 0.001082616;
constexpr double kJ3 = -0.00000253881;
constexpr double kJ4 = -0.00000165597;
constexpr double kJ3oJ2 = kJ3 / kJ2;
constexpr double kX2o3 = 2.0 / 3.0;
constexpr double kF = 1.0 / 298.26;
constexpr double kOmegaEarthRadMin = kTwoPi * 1.00273790934 / 1440.0;

double xke() { return 60.0 / std::sqrt(kRe * kRe * kRe / kMu); }

struct Sgp4Ctx {
  double no_unkozai, ecco, inclo, nodeo, argpo, mo, bstar;
  double cosio, sinio, con41, x1mth2, x7thm1;
  double cc1, cc4, cc5, eta, mdot, argpdot, nodedot;
  double omgcof, xmcof, nodecf, t2cof, xlcof, aycof, delmo, sinmao;
  double d2, d3, d4, t3cof, t4cof, t5cof;
  int isimp;
  int valid;
};

static_assert(sizeof(Sgp4Ctx) <= 64 * sizeof(double), "ctx fits buffer");

double fmod2p(double x) {
  x = std::fmod(x, kTwoPi);
  if (x < 0.0) x += kTwoPi;
  return x;
}

}  // namespace

extern "C" {

// elements: [no_kozai rad/min, ecco, inclo, nodeo, argpo, mo, bstar,
//            epoch_jd, 0, 0]
int dt_sgp4_init(const double* el, double* ctx_buf) {
  Sgp4Ctx* c = reinterpret_cast<Sgp4Ctx*>(ctx_buf);
  const double XKE = xke();
  double no_kozai = el[0], ecco = el[1], inclo = el[2];
  double nodeo = el[3], argpo = el[4], mo = el[5], bstar = el[6];
  if (!(ecco >= 0.0 && ecco < 1.0) || no_kozai <= 0.0) return -1;

  double cosio = std::cos(inclo), sinio = std::sin(inclo);
  double cosio2 = cosio * cosio;
  double eccsq = ecco * ecco, omeosq = 1.0 - eccsq;
  double rteosq = std::sqrt(omeosq);

  double ak = std::pow(XKE / no_kozai, kX2o3);
  double d1 = 0.75 * kJ2 * (3.0 * cosio2 - 1.0) / (rteosq * omeosq);
  double del_ = d1 / (ak * ak);
  double adel = ak * (1.0 - del_ * del_ - del_ * (1.0 / 3.0 + 134.0 * del_ * del_ / 81.0));
  del_ = d1 / (adel * adel);
  double no_unkozai = no_kozai / (1.0 + del_);

  double ao = std::pow(XKE / no_unkozai, kX2o3);
  double po = ao * omeosq;
  double con42 = 1.0 - 5.0 * cosio2;
  double con41 = -con42 - 2.0 * cosio2;
  double posq = po * po;
  double rp = ao * (1.0 - ecco);
  if (rp < 1.0) return -2;                       // below surface
  if (kTwoPi / no_unkozai >= 225.0) return -3;   // deep space: python path

  double ss = 78.0 / kRe + 1.0;
  double qzms2t = std::pow((120.0 - 78.0) / kRe, 4);
  int isimp = rp < (220.0 / kRe + 1.0) ? 1 : 0;
  double sfour = ss, qzms24 = qzms2t;
  double perige = (rp - 1.0) * kRe;
  if (perige < 156.0) {
    sfour = perige - 78.0;
    if (perige < 98.0) sfour = 20.0;
    qzms24 = std::pow((120.0 - sfour) / kRe, 4);
    sfour = sfour / kRe + 1.0;
  }
  double pinvsq = 1.0 / posq;
  double tsi = 1.0 / (ao - sfour);
  double eta = ao * ecco * tsi;
  double etasq = eta * eta, eeta = ecco * eta;
  double psisq = std::fabs(1.0 - etasq);
  double coef = qzms24 * std::pow(tsi, 4);
  double coef1 = coef / std::pow(psisq, 3.5);
  double cc2 = coef1 * no_unkozai *
      (ao * (1.0 + 1.5 * etasq + eeta * (4.0 + etasq)) +
       0.375 * kJ2 * tsi / psisq * con41 * (8.0 + 3.0 * etasq * (8.0 + etasq)));
  double cc1 = bstar * cc2;
  double cc3 = 0.0;
  if (ecco > 1.0e-4)
    cc3 = -2.0 * coef * tsi * kJ3oJ2 * no_unkozai * sinio / ecco;
  double x1mth2 = 1.0 - cosio2;
  double cc4 = 2.0 * no_unkozai * coef1 * ao * omeosq *
      (eta * (2.0 + 0.5 * etasq) + ecco * (0.5 + 2.0 * etasq) -
       kJ2 * tsi / (ao * psisq) *
           (-3.0 * con41 * (1.0 - 2.0 * eeta + etasq * (1.5 - 0.5 * eeta)) +
            0.75 * x1mth2 * (2.0 * etasq - eeta * (1.0 + etasq)) *
                std::cos(2.0 * argpo)));
  double cc5 = 2.0 * coef1 * ao * omeosq *
      (1.0 + 2.75 * (etasq + eeta) + eeta * etasq);
  double cosio4 = cosio2 * cosio2;
  double temp1 = 1.5 * kJ2 * pinvsq * no_unkozai;
  double temp2 = 0.5 * temp1 * kJ2 * pinvsq;
  double temp3 = -0.46875 * kJ4 * pinvsq * pinvsq * no_unkozai;
  double mdot = no_unkozai + 0.5 * temp1 * rteosq * con41 +
      0.0625 * temp2 * rteosq * (13.0 - 78.0 * cosio2 + 137.0 * cosio4);
  double argpdot = -0.5 * temp1 * con42 +
      0.0625 * temp2 * (7.0 - 114.0 * cosio2 + 395.0 * cosio4) +
      temp3 * (3.0 - 36.0 * cosio2 + 49.0 * cosio4);
  double xhdot1 = -temp1 * cosio;
  double nodedot = xhdot1 + (0.5 * temp2 * (4.0 - 19.0 * cosio2) +
                             2.0 * temp3 * (3.0 - 7.0 * cosio2)) * cosio;
  double omgcof = bstar * cc3 * std::cos(argpo);
  double xmcof = 0.0;
  if (ecco > 1.0e-4) xmcof = -kX2o3 * coef * bstar / eeta;
  double nodecf = 3.5 * omeosq * xhdot1 * cc1;
  double t2cof = 1.5 * cc1;
  double xlcof;
  if (std::fabs(cosio + 1.0) > 1.5e-12)
    xlcof = -0.25 * kJ3oJ2 * sinio * (3.0 + 5.0 * cosio) / (1.0 + cosio);
  else
    xlcof = -0.25 * kJ3oJ2 * sinio * (3.0 + 5.0 * cosio) / 1.5e-12;
  double aycof = -0.5 * kJ3oJ2 * sinio;
  double delmo = std::pow(1.0 + eta * std::cos(mo), 3);
  double sinmao = std::sin(mo);

  double d2 = 0, d3 = 0, d4 = 0, t3cof = 0, t4cof = 0, t5cof = 0;
  if (!isimp) {
    double cc1sq = cc1 * cc1;
    d2 = 4.0 * ao * tsi * cc1sq;
    double temp = d2 * tsi * cc1 / 3.0;
    d3 = (17.0 * ao + sfour) * temp;
    d4 = 0.5 * temp * ao * tsi * (221.0 * ao + 31.0 * sfour) * cc1;
    t3cof = d2 + 2.0 * cc1sq;
    t4cof = 0.25 * (3.0 * d3 + cc1 * (12.0 * d2 + 10.0 * cc1sq));
    t5cof = 0.2 * (3.0 * d4 + 12.0 * cc1 * d3 + 6.0 * d2 * d2 +
                   15.0 * cc1sq * (2.0 * d2 + cc1sq));
  }

  *c = Sgp4Ctx{no_unkozai, ecco, inclo, nodeo, argpo, mo, bstar,
               cosio, sinio, con41, x1mth2, 7.0 * cosio2 - 1.0,
               cc1, cc4, cc5, eta, mdot, argpdot, nodedot,
               omgcof, xmcof, nodecf, t2cof, xlcof, aycof, delmo, sinmao,
               d2, d3, d4, t3cof, t4cof, t5cof, isimp, 1};
  return 0;
}

int dt_sgp4_propagate(const double* ctx_buf, const double* t_min, size_t n,
                      double* r_km, double* v_kms) {
  const Sgp4Ctx* c = reinterpret_cast<const Sgp4Ctx*>(ctx_buf);
  if (!c->valid) return -1;
  const double XKE = xke();
  const double vkmps = kRe * XKE / 60.0;

  for (size_t k = 0; k < n; ++k) {
    double t = t_min[k];
    double xmdf = c->mo + c->mdot * t;
    double argpdf = c->argpo + c->argpdot * t;
    double nodedf = c->nodeo + c->nodedot * t;
    double argpm = argpdf, mm = xmdf;
    double t2 = t * t;
    double nodem = nodedf + c->nodecf * t2;
    double tempa = 1.0 - c->cc1 * t;
    double tempe = c->bstar * c->cc4 * t;
    double templ = c->t2cof * t2;
    if (!c->isimp) {
      double delomg = c->omgcof * t;
      double delmtemp = 1.0 + c->eta * std::cos(xmdf);
      double delm = c->xmcof * (delmtemp * delmtemp * delmtemp - c->delmo);
      double temp = delomg + delm;
      mm = xmdf + temp;
      argpm = argpdf - temp;
      double t3 = t2 * t, t4 = t3 * t;
      tempa -= c->d2 * t2 + c->d3 * t3 + c->d4 * t4;
      tempe += c->bstar * c->cc5 * (std::sin(mm) - c->sinmao);
      templ += c->t3cof * t3 + t4 * (c->t4cof + t * c->t5cof);
    }
    double am = std::pow(XKE / c->no_unkozai, kX2o3) * tempa * tempa;
    double nm = XKE / std::pow(am, 1.5);
    double em = c->ecco - tempe;
    if (em >= 1.0 || am < 0.95) return -4;
    if (em < 1.0e-6) em = 1.0e-6;
    mm += c->no_unkozai * templ;
    double xlm = mm + argpm + nodem;
    nodem = fmod2p(nodem);
    argpm = fmod2p(argpm);
    mm = fmod2p(xlm - argpm - nodem);

    double axnl = em * std::cos(argpm);
    double temp = 1.0 / (am * (1.0 - em * em));
    double aynl = em * std::sin(argpm) + temp * c->aycof;
    double xl = mm + argpm + nodem + temp * c->xlcof * axnl;

    double u = fmod2p(xl - nodem);
    double eo1 = u, tem5 = 9999.9;
    for (int it = 0; it < 10 && std::fabs(tem5) >= 1.0e-12; ++it) {
      double se = std::sin(eo1), ce = std::cos(eo1);
      tem5 = (u - aynl * ce + axnl * se - eo1) / (1.0 - ce * axnl - se * aynl);
      if (tem5 > 0.95) tem5 = 0.95;
      if (tem5 < -0.95) tem5 = -0.95;
      eo1 += tem5;
    }
    double se = std::sin(eo1), ce = std::cos(eo1);
    double ecose = axnl * ce + aynl * se;
    double esine = axnl * se - aynl * ce;
    double el2 = axnl * axnl + aynl * aynl;
    double pl = am * (1.0 - el2);
    if (pl < 0.0) return -5;
    double rl = am * (1.0 - ecose);
    double rdotl = std::sqrt(am) * esine / rl;
    double rvdotl = std::sqrt(pl) / rl;
    double betal = std::sqrt(1.0 - el2);
    temp = esine / (1.0 + betal);
    double sinu = am / rl * (se - aynl - axnl * temp);
    double cosu = am / rl * (ce - axnl + aynl * temp);
    double su = std::atan2(sinu, cosu);
    double sin2u = (cosu + cosu) * sinu;
    double cos2u = 1.0 - 2.0 * sinu * sinu;
    temp = 1.0 / pl;
    double temp1 = 0.5 * kJ2 * temp;
    double temp2 = temp1 * temp;
    double mrt = rl * (1.0 - 1.5 * temp2 * betal * c->con41) +
        0.5 * temp1 * c->x1mth2 * cos2u;
    if (mrt < 1.0) return -6;
    su -= 0.25 * temp2 * c->x7thm1 * sin2u;
    double xnode = nodem + 1.5 * temp2 * c->cosio * sin2u;
    double xinc = c->inclo + 1.5 * temp2 * c->cosio * c->sinio * cos2u;
    double mvt = rdotl - nm * temp1 * c->x1mth2 * sin2u / XKE;
    double rvdot = rvdotl + nm * temp1 * (c->x1mth2 * cos2u + 1.5 * c->con41) / XKE;

    double sinsu = std::sin(su), cossu = std::cos(su);
    double snod = std::sin(xnode), cnod = std::cos(xnode);
    double sini = std::sin(xinc), cosi = std::cos(xinc);
    double xmx = -snod * cosi, xmy = cnod * cosi;
    double ux = xmx * sinsu + cnod * cossu;
    double uy = xmy * sinsu + snod * cossu;
    double uz = sini * sinsu;
    double vx = xmx * cossu - cnod * sinsu;
    double vy = xmy * cossu - snod * sinsu;
    double vz = sini * cossu;

    r_km[3 * k] = mrt * ux * kRe;
    r_km[3 * k + 1] = mrt * uy * kRe;
    r_km[3 * k + 2] = mrt * uz * kRe;
    v_kms[3 * k] = (mvt * ux + rvdot * vx) * vkmps;
    v_kms[3 * k + 1] = (mvt * uy + rvdot * vy) * vkmps;
    v_kms[3 * k + 2] = (mvt * uz + rvdot * vz) * vkmps;
  }
  return 0;
}

namespace {

double gmst_rad(double jd) {
  double t = (jd - 2451545.0) / 36525.0;
  double sec = 67310.54841 + (876600.0 * 3600.0 + 8640184.812866) * t +
      0.093104 * t * t - 6.2e-6 * t * t * t;
  sec = std::fmod(sec, 86400.0);
  if (sec < 0.0) sec += 86400.0;
  return sec / 86400.0 * kTwoPi;
}

}  // namespace

// Full host schedule evaluation: unix times → doppler + telemetry fields.
int dt_doppler_curve(const double* ctx_buf, double epoch_jd,
                     double lat_deg, double lon_deg, double alt_m,
                     const double* unix_s, size_t n, double freq_hz,
                     double* doppler_hz, double* range_km,
                     double* range_rate, double* az_deg, double* el_deg) {
  const double lat = lat_deg * kPi / 180.0;
  const double lon = lon_deg * kPi / 180.0;
  const double alt_km = alt_m / 1000.0;
  const double sinlat = std::sin(lat), coslat = std::cos(lat);
  const double cgeo = 1.0 / std::sqrt(1.0 + kF * (kF - 2.0) * sinlat * sinlat);
  const double sgeo = (1.0 - kF) * (1.0 - kF) * cgeo;
  const double achcp = (kRe * cgeo + alt_km) * coslat;
  const double zsite = (kRe * sgeo + alt_km) * sinlat;
  const double omega_kms = kOmegaEarthRadMin / 60.0;
  const double c_m_s = 299792458.0;

  for (size_t k = 0; k < n; ++k) {
    double jd = unix_s[k] / 86400.0 + 2440587.5;
    double tsince = (jd - epoch_jd) * 1440.0;
    double r[3], v[3];
    int rc = dt_sgp4_propagate(ctx_buf, &tsince, 1, r, v);
    if (rc) return rc;
    double lst = std::fmod(gmst_rad(jd) + lon, kTwoPi);
    double coslst = std::cos(lst), sinlst = std::sin(lst);
    double rs[3] = {achcp * coslst, achcp * sinlst, zsite};
    double vs[3] = {-omega_kms * rs[1], omega_kms * rs[0], 0.0};
    double rho[3] = {r[0] - rs[0], r[1] - rs[1], r[2] - rs[2]};
    double drho[3] = {v[0] - vs[0], v[1] - vs[1], v[2] - vs[2]};
    double rng = std::sqrt(rho[0] * rho[0] + rho[1] * rho[1] + rho[2] * rho[2]);
    double rate = (rho[0] * drho[0] + rho[1] * drho[1] + rho[2] * drho[2]) / rng;
    double top_s = sinlat * coslst * rho[0] + sinlat * sinlst * rho[1] - coslat * rho[2];
    double top_e = -sinlst * rho[0] + coslst * rho[1];
    double top_z = coslat * coslst * rho[0] + coslat * sinlst * rho[1] + sinlat * rho[2];
    double az = std::atan2(top_e, -top_s);
    if (az < 0.0) az += kTwoPi;
    double elv = std::asin(top_z / rng > 1.0 ? 1.0 : (top_z / rng < -1.0 ? -1.0 : top_z / rng));
    if (doppler_hz) doppler_hz[k] = rate * 1000.0 / c_m_s * freq_hz * -1.0;
    if (range_km) range_km[k] = rng;
    if (range_rate) range_rate[k] = rate;
    if (az_deg) az_deg[k] = az * 180.0 / kPi;
    if (el_deg) el_deg[k] = elv * 180.0 / kPi;
  }
  return 0;
}

}  // extern "C"
