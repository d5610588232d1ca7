#pragma once
#include <complex>
typedef std::complex<float> gr_complex;
typedef std::complex<double> gr_complexd;
