#pragma once
#include <cmath>
#include <gnuradio/gr_complex.h>
static inline gr_complex gr_expj(float phase) { return gr_complex(std::cos(phase), std::sin(phase)); }
