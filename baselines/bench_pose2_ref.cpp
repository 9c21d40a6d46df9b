// Reference CPU-GTSAM baseline for the 2D dataset regressions: load2D +
// prior on pose 0 (sigmas 1e-3,1e-3,1e-4 — matching
// tests/test_dataset_regressions.py) + default LM.  Prints JSON with the
// initial and converged half-chi2 so gtsam_tpu pins assert REFERENCE parity.
#include <gtsam/slam/dataset.h>
#include <gtsam/slam/PriorFactor.h>
#include <gtsam/nonlinear/LevenbergMarquardtOptimizer.h>
#include <gtsam/geometry/Pose2.h>

#include <chrono>
#include <cstdio>
#include <string>

using namespace gtsam;

int main(int argc, char* argv[]) {
  if (argc < 2) { fprintf(stderr, "usage: bench_pose2_ref <2d-file> [iters]\n"); return 1; }
  const std::string filename = argv[1];
  const int max_iters = argc > 2 ? atoi(argv[2]) : 40;

  NonlinearFactorGraph::shared_ptr graph;
  Values::shared_ptr initial;
  std::tie(graph, initial) = load2D(filename);

  auto priorModel = noiseModel::Diagonal::Sigmas(Vector3(1e-3, 1e-3, 1e-4));
  graph->addPrior(0, initial->at<Pose2>(0), priorModel);

  double err0 = graph->error(*initial);

  LevenbergMarquardtParams params;
  params.maxIterations = max_iters;
  auto t0 = std::chrono::steady_clock::now();
  LevenbergMarquardtOptimizer opt(*graph, *initial, params);
  Values result = opt.optimize();
  double wall = std::chrono::duration<double>(
      std::chrono::steady_clock::now() - t0).count();

  printf("{\"file\": \"%s\", \"initial_half_chi2\": %.6f, "
         "\"converged_half_chi2\": %.6f, \"iters\": %zu, \"wall_s\": %.3f, "
         "\"poses\": %zu, \"factors\": %zu}\n",
         filename.c_str(), err0, graph->error(result),
         opt.iterations(), wall, initial->size(), graph->size());
  return 0;
}
