"""Package build: pure-Python + one plain C extension (no pybind11/CMake).

The reference needs a CMake superbuild fetching two external C++ trees
(/root/reference/setup.py:39-45, CMakeLists.txt); here the compute path
is JAX/Pallas so the only native piece is the host-side keygen sieve /
limb packer, built as a standard setuptools extension with a Python
fallback when no toolchain exists.
"""

from setuptools import Extension, find_packages, setup
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    def run(self):
        try:
            super().run()
        except Exception as e:  # toolchain missing: Python fallback kicks in
            print(f"warning: native extension skipped ({e})")

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as e:
            print(f"warning: native extension {ext.name} skipped ({e})")


setup(
    name="pailliercryptolib_python_tpu",
    version="2.0.0",
    description="TPU-native Paillier cryptosystem framework (JAX/Pallas)",
    packages=find_packages(include=["pailliercryptolib_python_tpu*"]),
    package_data={"pailliercryptolib_python_tpu.native": ["*.c"]},
    ext_modules=[
        Extension(
            "pailliercryptolib_python_tpu.native._paillier_native",
            sources=["pailliercryptolib_python_tpu/native/sieve.c"],
            extra_compile_args=["-O3"],
        )
    ],
    cmdclass={"build_ext": OptionalBuildExt},
    install_requires=["numpy", "jax"],
    python_requires=">=3.10",
)
