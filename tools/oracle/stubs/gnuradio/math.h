#pragma once
#include <cmath>
#include <gnuradio/gr_complex.h>
#define GR_M_PI M_PI
namespace gr { static inline float fast_atan2f(gr_complex c){ return std::atan2(c.imag(), c.real()); } }
