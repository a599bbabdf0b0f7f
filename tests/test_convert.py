"""convert-kinematics CLI tests."""

import numpy as np
import pytest

from attpc_engine_tpu import nuclear_map
from attpc_engine_tpu.kinematics import (
    KinematicsPipeline,
    ExcitationGaussian,
    PolarUniform,
    Reaction,
    run_kinematics_pipeline,
)

pa = pytest.importorskip("pyarrow")
import pyarrow.parquet as pq  # noqa: E402

from attpc_engine_tpu.io.convert_kinematics import (  # noqa: E402
    convert_kinematics_hdf5_to_parquet,
)


def test_convert(tmp_path):
    pipeline = KinematicsPipeline(
        [
            Reaction(
                target=nuclear_map.get_data(6, 12),
                projectile=nuclear_map.get_data(1, 2),
                ejectile=nuclear_map.get_data(1, 1),
            )
        ],
        [ExcitationGaussian(0.0, 0.0)],
        [PolarUniform(0.0, np.pi)],
        16.0,
    )
    kine = tmp_path / "k.h5"
    run_kinematics_pipeline(pipeline, 16, kine, batch_size=16, seed=5,
                            show_progress=False)
    out = tmp_path / "k.parquet"
    convert_kinematics_hdf5_to_parquet(kine, out, batch_size=7)
    table = pq.read_table(out)
    assert table.num_rows == 16 * 4
    df = table.to_pydict()
    assert df["isotope"][:4] == ["12C", "2H", "1H", "13C"]
    assert df["event"][0] == 0 and df["event"][-1] == 15
    # energies are total E in MeV: target row is its rest mass
    assert abs(df["energy"][0] - nuclear_map.get_data(6, 12).mass) < 1e-6
