"""Pack a tile dataset into the native .msts format (one-time ETL).

After the GeoTIFF tile directories are built (create_enmap_dataset /
create_enmap_dfc_dataset), packing them removes the per-tile GDAL read from
every epoch:

  python -m maskedsst_tpu.etl.pack_tiles --dataset enmap \
      --train-path data/enmap_worldcover_dataset/train --out train.msts
  python -m maskedsst_tpu.etl.pack_tiles --synthetic --out synth.msts
"""

from __future__ import annotations

import argparse


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", required=True)
    parser.add_argument("--dataset", default="enmap", choices=["enmap", "dfc", "worldcover"])
    parser.add_argument("--train-path", default=None)
    parser.add_argument("--target-type", default=None, help="worldcover|dfc|unlabeled")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--synthetic-tiles", type=int, default=256)
    parser.add_argument("--n-bands", type=int, default=200)
    args = parser.parse_args()

    from maskedsst_tpu.native import pack_tiles

    if args.synthetic:
        from maskedsst_tpu.data.synthetic import SyntheticCubeDataset

        ds = SyntheticCubeDataset(num_tiles=args.synthetic_tiles, n_bands=args.n_bands)
    else:
        from maskedsst_tpu.data.enmap import EnMAPWorldCoverDataset

        assert args.train_path, "--train-path required without --synthetic"
        target = args.target_type or ("dfc" if args.dataset == "dfc" else "worldcover")
        ds = EnMAPWorldCoverDataset(args.train_path, target_type=target)

    pack_tiles(ds, args.out)
    print(f"packed {len(ds)} tiles -> {args.out}")


if __name__ == "__main__":
    main()
