# convnet_tpu build helpers.
# Runtime needs nothing built: generated protobuf code is checked in and
# the native data-loader is optional (Python fallback exists).

.PHONY: proto native test clean

proto:
	cd convnet_tpu/proto && protoc --python_out=. convnet_config.proto

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -x -q

clean:
	$(MAKE) -C native clean || true
	find . -name __pycache__ -type d -exec rm -rf {} +
