"""Generate the F2 golden files (FIXTURES.md): per-pixel aggregates for
the micro fixture at resolutions {1.0, 2.5} × {square, hex} ×
rotations {0°, 120°, 240°}, keyed order-insensitively on centroid.

Run once (values were cross-verified against the DuckDB oracles in
tests/test_entry_oracle.py and hand-computed expectations in
tests/test_rasterize.py) and commit the CSVs; tests/test_golden.py
pins engine output against them thereafter.

    PYTHONPATH=/root/repo python tests/golden/generate.py
"""

import os

import pandas as pd

HERE = os.path.dirname(os.path.abspath(__file__))


def fixture_df():
    rows = [
        ("p00", 0.25, 0.25, 1, 10.0, "en"),
        ("p01", 0.75, 0.25, 2, -5.0, "en"),
        ("p02", 1.0, 0.5, 4, 0.0, "de"),
        ("p03", 1.5, 0.5, 8, 2.5, "de"),
        ("p04", 2.0, 2.0, 16, 1.0, "fr"),
        ("p05", 0.0, 0.0, 32, 3.0, "en"),
        ("p06", 0.25, 0.25, 64, 7.0, "en"),
        ("p07", 3.5, 3.5, 128, -1.0, "fr"),
        ("p08", 2.5, 0.5, 256, 4.0, "de"),
        ("p09", 0.5, 2.5, 512, 6.0, "en"),
    ]
    return pd.DataFrame(rows, columns=["url", "x", "y", "f1", "f2", "lang"])


def main():
    import ray
    import ray.data as rd

    from rayraster import rasterize_features, permutate_by_rotation

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    df = fixture_df()
    ds = rd.from_pandas(df)
    rotated = permutate_by_rotation(ds, 3, origin=(2.0, 2.0))
    for res in (1.0, 2.5):
        for square in (True, False):
            out, _ = rasterize_features(
                rotated, res, ["f1", "f2"], square=square, fun="mean",
                extra_keys=("rotation",),
            )
            pdf = out.to_pandas()[
                ["rotation", "cx", "cy", "num_cell",
                 "sum_f1", "mean_f1", "sum_f2", "mean_f2"]
            ].sort_values(["rotation", "cx", "cy"]).reset_index(drop=True)
            name = f"raster_res{res}_{'sq' if square else 'hex'}.csv"
            pdf.to_csv(os.path.join(HERE, name), index=False, float_format="%.12g")
            print("wrote", name, len(pdf), "pixels")
    ray.shutdown()


if __name__ == "__main__":
    main()
