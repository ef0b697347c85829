from stgcn_tpu.utils.logging import CsvLogger, MultiLogger, TensorBoardLogger
