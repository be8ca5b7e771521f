// Minimal stand-in for the CTPL thread pool (submodule empty in the
// checkout): push(f) runs f(id) via std::async. Semantics the reference
// relies on (futures + concurrent execution) are preserved.
#pragma once
#include <future>
#include <utility>

namespace ctpl {
class thread_pool {
 public:
  explicit thread_pool(int /*n_threads*/) {}
  template <typename F>
  auto push(F&& f) -> std::future<decltype(f(0))> {
    return std::async(std::launch::async, std::forward<F>(f), 0);
  }
};
}  // namespace ctpl
