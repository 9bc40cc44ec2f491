"""Write the pinned sample IONEX file for the ionex_file_bilinear gate row.

The file carries the deterministic INTEGER TEC field
(synth.tecu_q_int == corner_tec_sql * 10, exponent -1), so the DuckDB
oracle can recompute every interpolated value from pure arithmetic —
a fully INDEPENDENT oracle for the whole ingest path: Spark parses the
actual ASCII (binaryFile -> mapInPandas block parser), DuckDB never
sees the file.

Usage: python tools/gen_sample_ionex.py
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/ionex_spark/data/sample_CKMG0010.22I.gz"
N_EPOCHS = 3


def main() -> None:
    from ionex_spark.core import synth
    from ionex_spark.core.ionex_io import IonexHeader, write_ionex_file
    from ionex_spark.core.linspace import ckmg_grid

    epochs = (
        synth.EPOCH0 + np.arange(N_EPOCHS) * np.timedelta64(3600, "s")
    ).astype("datetime64[s]")
    slot, lat_i, lon_i, _, _, tecu_q = synth.tec_points_arrays(
        N_EPOCHS, "int"
    )
    dense = np.full(
        (N_EPOCHS, synth.GRID_NLAT, synth.GRID_NLON), 9999, np.int64
    )
    dense[slot, synth.GRID_NLAT - 1 - lat_i, lon_i] = tecu_q
    hdr = IonexHeader(
        grid=ckmg_grid(),
        interval_s=synth.SAMPLING_S,
        epoch_first=synth.EPOCH0,
        epoch_last=epochs[-1],
        number_of_maps=N_EPOCHS,
        exponent=synth.FILE_EXP,
        comments=["pinned sample: integer TEC field, SQL-reproducible"],
    )
    write_ionex_file(OUT, hdr, epochs, dense)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
