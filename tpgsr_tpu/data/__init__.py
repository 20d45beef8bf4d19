from tpgsr_tpu.data.lmdb import LMDBReader, write_lmdb

__all__ = ["LMDBReader", "write_lmdb"]
