"""Build the native host-runtime extension:

    cd native && python setup.py build_ext --inplace
    (the built .so is picked up by dvbs2rx_tpu.io.native)
"""

from setuptools import setup, Extension

setup(
    name="dvbs2rx_native",
    ext_modules=[
        Extension(
            "dvbs2rx_native",
            sources=["dvbs2rx_native.c"],
            extra_compile_args=["-O3"],
        )
    ],
)
