"""Build hook for the native host-runtime C extension.

Static metadata lives in pyproject.toml; this file only declares the
extension module (setuptools still needs setup.py for ext_modules).
``pip install -e .`` builds it; ``dvbs2rx_tpu.io.native`` falls back to
numpy implementations when the extension is absent.
"""

from setuptools import setup, Extension

setup(
    ext_modules=[
        Extension(
            "dvbs2rx_native",
            sources=["native/dvbs2rx_native.c"],
            extra_compile_args=["-O3"],
        )
    ],
)
