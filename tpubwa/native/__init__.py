from tpubwa.native.build import load_native

__all__ = ["load_native"]
