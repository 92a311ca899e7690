"""Relief shading (diffuse hillshade) of DEMs (reference: tiff_relief.py).

    python examples/tiff_relief.py <file-or-dir> [--out DIR]
"""

import argparse
import os

import soillib_tpu as soil


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    for file, path in soil.util.iter_tiff(args.input):
        image = soil.geotiff(path)
        scale = image.meta.scale or (1.0, 1.0, 1.0)
        print(f"File: {file}")
        save = os.path.join(args.out, file + ".relief.png") if args.out else None
        if save:
            os.makedirs(args.out, exist_ok=True)
        soil.util.show_relief(image.numpy(), scale, show=not save, save=save)


if __name__ == "__main__":
    main()
