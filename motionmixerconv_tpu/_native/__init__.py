"""Native (C++) components, lazily compiled with the system toolchain.

The extension is built once into a user cache directory on first use and
loaded through ctypes; every consumer has a pure-Python fallback, so the
framework works without a compiler (just slower preprocessing).
"""

from .build import load_csv_reader, read_csv_many_native, read_csv_native

__all__ = ["load_csv_reader", "read_csv_many_native", "read_csv_native"]
