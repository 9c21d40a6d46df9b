// Writes the reference's optimized sphere2500 trajectory to a g2o file so
// ATE vs sphere2500_groundtruth.txt can be computed (BASELINE.json "ATE
// parity" clause).  Same pipeline as bench_pose3_ref.cpp.
#include <gtsam/slam/dataset.h>
#include <gtsam/slam/InitializePose3.h>
#include <gtsam/slam/BetweenFactor.h>
#include <gtsam/nonlinear/LevenbergMarquardtOptimizer.h>
#include <gtsam/geometry/Pose3.h>
#include <cstdio>
using namespace gtsam;
int main(int argc, char* argv[]) {
  if (argc < 3) { fprintf(stderr, "usage: bench_pose3_ate <file> <out.g2o>\n"); return 1; }
  NonlinearFactorGraph::shared_ptr graph; Values::shared_ptr initial;
  std::tie(graph, initial) = readG2o(argv[1], true);
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
  Values init2 = InitializePose3::initialize(*graph);
  LevenbergMarquardtParams params; params.maxIterations = 15;
  Values result = LevenbergMarquardtOptimizer(*graph, init2, params).optimize();
  printf("{\"converged_half_chi2\": %.6f}\n", graph->error(result));
  writeG2o(*graph, result, argv[2]);
  return 0;
}
