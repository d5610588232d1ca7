#pragma once
// minimal C-loop stands-ins for the VOLK kernels the PL classes use
#include <cstdint>
#include <complex>
typedef std::complex<float> lv_32fc_t;
static inline void volk_64u_popcnt(uint64_t* out, uint64_t in){ *out = __builtin_popcountll(in); }
static inline void volk_32f_x2_dot_prod_32f(float* r, const float* a, const float* b, unsigned n){ float s=0; for(unsigned i=0;i<n;i++) s+=a[i]*b[i]; *r=s; }
static inline void volk_32f_index_max_32u(uint32_t* r, const float* v, unsigned n){ uint32_t m=0; for(unsigned i=1;i<n;i++) if(v[i]>v[m]) m=i; *r=m; }
static inline void volk_32fc_x2_multiply_32fc(lv_32fc_t* o, const lv_32fc_t* a, const lv_32fc_t* b, unsigned n){ for(unsigned i=0;i<n;i++) o[i]=a[i]*b[i]; }
