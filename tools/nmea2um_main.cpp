// nmea2um: convert NMEA GGA logs (e.g. LabSat SatGen output) into the
// 10 Hz ECEF user-motion CSV consumed by the simulator's -u flag.
//
// Behavioral parity with the reference tool (satgen/nmea2um.c:50-137):
// every *GGA sentence becomes one 0.1 s row "t,x,y,z"; latitude/longitude
// are ddmm.mmmm / dddmm.mmmm with N/S/E/W sign; height = MSL altitude +
// geoid separation; WGS84 geodetic -> ECEF conversion.

#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <string>
#include <vector>

namespace {

constexpr double kR2D = 57.2957795131;

void llh2xyz(const double llh[3], double xyz[3]) {
  constexpr double a = 6378137.0;
  constexpr double e = 0.0818191908426;
  const double e2 = e * e;
  const double clat = cos(llh[0]), slat = sin(llh[0]);
  const double clon = cos(llh[1]), slon = sin(llh[1]);
  const double d = e * slat;
  const double n = a / sqrt(1.0 - d * d);
  const double nph = n + llh[2];
  xyz[0] = nph * clat * clon;
  xyz[1] = nph * clat * slon;
  xyz[2] = ((1.0 - e2) * n + llh[2]) * slat;
}

std::vector<std::string> split(const std::string& line, char sep) {
  std::vector<std::string> out;
  size_t pos = 0;
  while (true) {
    size_t next = line.find(sep, pos);
    if (next == std::string::npos) {
      out.push_back(line.substr(pos));
      break;
    }
    out.push_back(line.substr(pos, next - pos));
    pos = next + 1;
  }
  return out;
}

// ddmm.mmmm (2 or 3 degree digits) -> signed degrees.
double dm_to_deg(const std::string& dm, int deg_digits, bool negative) {
  if (dm.size() < static_cast<size_t>(deg_digits)) return 0.0;
  double deg = atof(dm.substr(0, deg_digits).c_str()) +
               atof(dm.substr(deg_digits).c_str()) / 60.0;
  return negative ? -deg : deg;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc != 3) {
    fprintf(stderr, "Usage: nmea2um <nmea_gga> <user_motion>\n");
    return 1;
  }
  FILE* in = fopen(argv[1], "rt");
  if (in == nullptr) {
    fprintf(stderr, "Failed to open NMEA file.\n");
    return 1;
  }
  FILE* out = fopen(argv[2], "wt");
  if (out == nullptr) {
    fprintf(stderr, "Failed to open user motion file.\n");
    return 1;
  }

  char buf[512];
  double t = 0.0;
  while (fgets(buf, sizeof(buf), in) != nullptr) {
    std::string line(buf);
    while (!line.empty() && (line.back() == '\n' || line.back() == '\r')) {
      line.pop_back();
    }
    auto f = split(line, ',');
    // f[0] = "$GPGGA" / "$GNGGA" / ... — match the talker-independent
    // sentence id, as the reference does (satgen/nmea2um.c:84).
    if (f.size() < 12 || f[0].size() < 6 || f[0].compare(3, 3, "GGA") != 0) {
      continue;
    }
    double llh[3], xyz[3];
    llh[0] = dm_to_deg(f[2], 2, !f[3].empty() && f[3][0] == 'S') / kR2D;
    llh[1] = dm_to_deg(f[4], 3, !f[5].empty() && f[5][0] == 'W') / kR2D;
    llh[2] = atof(f[9].c_str()) + atof(f[11].c_str());
    llh2xyz(llh, xyz);
    fprintf(out, "%5.1f,%12.3f,%12.3f,%12.3f\n", t, xyz[0], xyz[1], xyz[2]);
    t += 0.1;  // one GGA sentence per 10 Hz step
  }

  fclose(in);
  fclose(out);
  return 0;
}
