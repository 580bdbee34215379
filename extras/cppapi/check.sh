#!/bin/bash
# Build-and-run check for the C++ deployment binaries, on-device.
#
# Builds the three binaries, exports a real .cppengine, validates it
# with odtk_export, then runs odtk_infer on a JPEG against the attached
# TPU (PJRT plugin) and prints its latency line.
#
# MUST own the only TPU claim: don't run while bench.py / training / any
# other JAX process is attached to the chip (concurrent clients deadlock
# on the claim — see CLAUDE.md). The pytest half (tests/test_cppapi.py)
# covers build + container parsing without a device.
#
# Usage: extras/cppapi/check.sh [plugin.so] [workdir]

set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
ROOT="$(cd "$HERE/../.." && pwd)"
PLUGIN="${1:-/opt/axon/libaxon_pjrt.so}"
WORK="${2:-$(mktemp -d)}"

echo "==> building"
cmake -B "$HERE/build" -G Ninja "$HERE" > /dev/null
ninja -C "$HERE/build"

echo "==> exporting engine + test image to $WORK"
# export lowers for the TPU platform WITHOUT claiming the chip
# (cross-platform jax.export on the CPU backend), so the C++ process
# below gets the only client
ODTK_PLATFORM=cpu python - "$WORK" <<EOF
import sys
sys.path.insert(0, '$ROOT')
sys.path.insert(0, '$ROOT/tests')
import jax
jax.config.update('jax_compilation_cache_dir', '$ROOT/.jax_cache')
from synth import make_dataset
from odtk_tpu.model import Model
from odtk_tpu.export import export_cpp_engine

img_dir, _ = make_dataset(sys.argv[1], n_images=1, size=(300, 400),
                          fmt='jpg')
m = Model(backbones='ResNet18FPN', classes=3)
m.initialize(rng=0, image_size=(128, 128))
export_cpp_engine(m, (320, 320), batch=1,
                  path=sys.argv[1] + '/model.cppengine',
                  precision='bf16', platform='tpu', verbose=True)
EOF

echo "==> odtk_export (container contract)"
"$HERE/build/odtk_export" "$WORK/model.cppengine"

echo "==> odtk_infer (on-device, plugin $PLUGIN)"
"$HERE/build/odtk_infer" "$WORK/model.cppengine" \
    "$WORK/images/img_000.jpg" "$WORK/out.png" "$PLUGIN"

echo "CPPAPI CHECK PASSED (workdir $WORK)"
