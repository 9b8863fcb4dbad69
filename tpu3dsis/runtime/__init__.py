from tpu3dsis.runtime.native import native_available, decode_chunk_native

__all__ = ["native_available", "decode_chunk_native"]
