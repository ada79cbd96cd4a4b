// Minimal PCL console stub so the REAL reference octree.cpp compiles here
// without PCL (only used for log macros). Validation harness only.
#pragma once
#include <cstdio>
#define PCL_ERROR(...) std::fprintf(stderr, __VA_ARGS__)
#define PCL_WARN(...) std::fprintf(stderr, __VA_ARGS__)
#define PCL_INFO(...) std::fprintf(stderr, __VA_ARGS__)
#define PCL_DEBUG(...)
