#pragma once
#include <vector>
namespace volk { template <class T> using vector = std::vector<T>; }
