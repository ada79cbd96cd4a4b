// Minimal pcl::console::TicToc stub (wall timer) for the extraction build.
#pragma once
#include <chrono>
namespace pcl { namespace console {
class TicToc {
  std::chrono::steady_clock::time_point t0;
 public:
  void tic() { t0 = std::chrono::steady_clock::now(); }
  double toc() {
    return std::chrono::duration<double, std::milli>(
        std::chrono::steady_clock::now() - t0).count();
  }
};
}}
