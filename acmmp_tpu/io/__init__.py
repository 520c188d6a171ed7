from acmmp_tpu.io.dmb import read_dmb, write_dmb  # noqa: F401
from acmmp_tpu.io.ply import write_ply, read_ply  # noqa: F401
from acmmp_tpu.io.dense_folder import (  # noqa: F401
    read_cam_txt,
    write_cam_txt,
    read_pair_txt,
    write_pair_txt,
    Problem,
)
