from .timer import Timer, timed
from .log import get_logger, set_file_logger
from .serialize import (
    msgpack_dump, msgpack_load, json_dump, json_load,
    pickle_dump, pickle_load, df_dump, df_load,
)
from .misc import (
    extract_fn, mkdir_p, shell, AverageMeter, stat,
    split_idxs_train_val, split_out_chunk, increment_path, init_seeds,
)
