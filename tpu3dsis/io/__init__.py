from tpu3dsis.io.chunk_format import RawChunk, read_chunk_file, write_chunk_file
from tpu3dsis.io.dataset import Sample, SceneDataset, encode_tsdf, pad_sample

__all__ = [
    "RawChunk",
    "read_chunk_file",
    "write_chunk_file",
    "Sample",
    "SceneDataset",
    "encode_tsdf",
    "pad_sample",
]
