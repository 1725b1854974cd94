# convnet_tpu build helpers.
# Runtime needs nothing built: generated protobuf code is checked in and
# the native data-loader is optional (Python fallback exists).

.PHONY: proto native test test-tpu bench dryrun clean

proto:
	cd convnet_tpu/proto && protoc --python_out=. convnet_config.proto

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -x -q

test-tpu:  # hardware-eligible subset on the real chip (compiled Pallas)
	CONVNET_TEST_TPU=1 CONVNET_DROPOUT_BACKEND=pallas python -m pytest \
	    tests/test_ops.py tests/test_dropout.py tests/test_torch_parity.py \
	    tests/test_prologue.py tests/test_fused_pool_lrn.py \
	    tests/test_s2d_relayout.py tests/test_lrn_bias.py \
	    tests/test_jitter_gather.py tests/test_pool_pallas.py \
	    tests/test_tpu_numerics.py -x -q

bench:  # headline AlexNet img/s on the local accelerator
	python bench.py

dryrun:  # multi-chip sharding validation on an 8-device virtual CPU mesh
	XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

clean:
	$(MAKE) -C native clean || true
	find . -name __pycache__ -type d -exec rm -rf {} +
