// Reference CPU-GTSAM baseline: sphere2500 Pose3 SLAM (chordal init + LM).
// Mirrors /root/reference/examples/Pose3SLAMExample_initializePose3Chordal.cpp
// with manual iterate() timing; prints JSON.
#include <gtsam/slam/dataset.h>
#include <gtsam/slam/InitializePose3.h>
#include <gtsam/slam/PriorFactor.h>
#include <gtsam/slam/BetweenFactor.h>
#include <gtsam/nonlinear/LevenbergMarquardtOptimizer.h>
#include <gtsam/geometry/Pose3.h>

#include <chrono>
#include <cstdio>
#include <string>

using namespace gtsam;

int main(int argc, char* argv[]) {
  if (argc < 2) { fprintf(stderr, "usage: bench_pose3_ref <g2o/toro-file> [iters]\n"); return 1; }
  const std::string filename = argv[1];
  const int max_iters = argc > 2 ? atoi(argv[2]) : 15;

  NonlinearFactorGraph::shared_ptr graph;
  Values::shared_ptr initial;
  bool is3D = true;
  std::tie(graph, initial) = readG2o(filename, is3D);

  // TORO files like sphere2500.txt carry edges only: build the odometry
  // initial by composing successive between measurements (SolverComparer-
  // style), so both frameworks start from the same guess.
  if (initial->size() == 0) {
    initial->insert(0, Pose3());
    for (const auto& f : *graph) {
      auto bf = std::dynamic_pointer_cast<BetweenFactor<Pose3>>(f);
      if (!bf) continue;
      Key k1 = bf->keys()[0], k2 = bf->keys()[1];
      if (initial->exists(k1) && !initial->exists(k2) && k2 == k1 + 1)
        initial->insert(k2, initial->at<Pose3>(k1) * bf->measured());
    }
  }
  auto priorModel = noiseModel::Diagonal::Variances(
      (Vector(6) << 1e-6, 1e-6, 1e-6, 1e-4, 1e-4, 1e-4).finished());
  graph->addPrior(0, initial->at<Pose3>(0), priorModel);

  auto tc0 = std::chrono::steady_clock::now();
  Values chordal = InitializePose3::initialize(*graph);
  double chordal_s = std::chrono::duration<double>(
      std::chrono::steady_clock::now() - tc0).count();

  const double err0 = graph->error(chordal);
  printf("{\"file\": \"%s\", \"poses\": %zu, \"factors\": %zu, "
         "\"chordal_s\": %.3f, \"initial_half_chi2\": %.6g, \"iters\": [",
         filename.c_str(), initial->size(), graph->size(), chordal_s, err0);
  fflush(stdout);

  LevenbergMarquardtParams params;  // default MULTIFRONTAL_CHOLESKY + COLAMD
  LevenbergMarquardtOptimizer lm(*graph, chordal, params);
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
