// Reference CPU-GTSAM baseline: BAL bundle adjustment per-iteration timing.
// Mirrors /root/reference/timing/timeSFMBAL.cpp (GeneralSFMFactor +
// Schur ordering: points first, cameras last) but drives iterate() manually
// to report wall-clock per LM iteration and the error trajectory as JSON.
#include <gtsam/sfm/SfmData.h>
#include <gtsam/slam/GeneralSFMFactor.h>
#include <gtsam/geometry/Cal3Bundler.h>
#include <gtsam/geometry/PinholeCamera.h>
#include <gtsam/nonlinear/LevenbergMarquardtOptimizer.h>
#include <gtsam/nonlinear/NonlinearFactorGraph.h>
#include <gtsam/nonlinear/Values.h>
#include <gtsam/inference/Symbol.h>

#include <chrono>
#include <cstdio>
#include <string>

using namespace gtsam;
using symbol_shorthand::C;
using symbol_shorthand::P;

typedef PinholeCamera<Cal3Bundler> Camera;
typedef GeneralSFMFactor<Camera, Point3> SfmFactor;

int main(int argc, char* argv[]) {
  if (argc < 2) { fprintf(stderr, "usage: bench_bal_ref <bal-file> [iters]\n"); return 1; }
  const std::string filename = argv[1];
  const int max_iters = argc > 2 ? atoi(argv[2]) : 10;

  SfmData db = SfmData::FromBalFile(filename);
  auto noise = noiseModel::Unit::Create(2);

  NonlinearFactorGraph graph;
  for (size_t j = 0; j < db.numberTracks(); j++)
    for (const SfmMeasurement& m : db.tracks[j].measurements)
      graph.emplace_shared<SfmFactor>(m.second, noise, C(m.first), P(j));

  Values initial;
  size_t i = 0, j = 0;
  for (const SfmCamera& camera : db.cameras) initial.insert(C(i++), camera);
  for (const SfmTrack& track : db.tracks) initial.insert(P(j++), track.p);

  LevenbergMarquardtParams params;
  LevenbergMarquardtParams::SetCeresDefaults(&params);
  Ordering ordering;  // Schur: points first (timeSFMBAL.h:77-84)
  for (size_t j2 = 0; j2 < db.numberTracks(); j2++) ordering.push_back(P(j2));
  for (size_t i2 = 0; i2 < db.numberCameras(); i2++) ordering.push_back(C(i2));
  params.setOrdering(ordering);

  const double err0 = graph.error(initial);
  printf("{\"file\": \"%s\", \"cams\": %zu, \"pts\": %zu, \"obs\": %zu, "
         "\"initial_half_chi2\": %.6g, \"iters\": [",
         filename.c_str(), db.numberCameras(), db.numberTracks(),
         (size_t)graph.size(), err0);
  fflush(stdout);

  LevenbergMarquardtOptimizer lm(graph, initial, params);
  double prev = err0;
  for (int it = 0; it < max_iters; ++it) {
    auto t0 = std::chrono::steady_clock::now();
    lm.iterate();
    double dt = std::chrono::duration<double>(
        std::chrono::steady_clock::now() - t0).count();
    double e = lm.error();
    printf("%s{\"s\": %.3f, \"half_chi2\": %.6g}", it ? ", " : "", dt, e);
    fflush(stdout);
    if (prev - e < 1e-7 * prev) break;
    prev = e;
  }
  printf("]}\n");
  return 0;
}
