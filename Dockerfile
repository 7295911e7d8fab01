# Slim CPU image for tetris-gymnasium-tpu: package + jax[cpu] + tests + docs.
#
# The engine is TPU-first but every kernel runs on the XLA CPU backend too
# (the test suite runs on a virtual 8-device CPU mesh); this image is for
# development, CI and docs builds. On a TPU VM, install the package on top
# of the libtpu-enabled jax the VM ships instead.
#
# Build:  docker build -t tetris-gymnasium-tpu .
# Test:   docker run --rm tetris-gymnasium-tpu
# Docs:   docker run --rm tetris-gymnasium-tpu python docs/build.py
# Wheel:  docker build --target wheel-check .   (packaging check, CI parity)
FROM python:3.11-slim AS dev

WORKDIR /app

# Layer the (stable) dependencies before the (volatile) source tree so code
# edits don't re-download jax.
RUN pip install --no-cache-dir "jax[cpu]>=0.4.30" "flax>=0.8" "numpy>=1.24" \
    "gymnasium>=1.1" "optax>=0.2" "orbax-checkpoint" "pytest>=7" "imageio"

COPY pyproject.toml README.md LICENSE CITATION.cff ./
COPY tetris_gymnasium_tpu ./tetris_gymnasium_tpu
COPY tests ./tests
COPY examples ./examples
COPY docs ./docs
COPY results ./results

RUN pip install --no-cache-dir --no-deps .

CMD ["python", "-m", "pytest", "tests/", "-q"]

# -- wheel stage: prove the built wheel installs and runs outside the tree --
# (explicit target; the default build below stays the dev image)
# Build:  docker build --target wheel-check -t tgt-wheel .
FROM python:3.11-slim AS wheel-check
WORKDIR /w
RUN pip install --no-cache-dir "jax[cpu]>=0.4.30" "flax>=0.8" "numpy>=1.24" \
    "gymnasium>=1.1" build
COPY pyproject.toml README.md LICENSE ./
COPY tetris_gymnasium_tpu ./tetris_gymnasium_tpu
COPY tools/wheel_smoke.py ./tools/wheel_smoke.py
RUN python -m build --wheel && pip install --no-deps dist/*.whl
# run from / so the repo tree can't shadow the installed package
RUN cd / && python /w/tools/wheel_smoke.py

# default target: the dev image above
FROM dev
