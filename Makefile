# Convenience targets (no build step needed for the Python package).

.PHONY: test test-fast bench demo sweep pipeline native clean

test:
	python -m pytest tests/ -q

# unit tier: ~5-6 min (end-to-end training tests are marked slow)
test-fast:
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

demo:
	python -m pigan_thz_tpu train --mode full --fixed-physics --plot \
	    --workdir runs --set train.num_epochs=200 --set train.fwd_pretrain_epochs=200
	python -m pigan_thz_tpu evaluate --models runs/saved_models --plot

sweep:
	python examples/ablation_sweep.py --members 8 --epochs 100

pipeline:
	for i in $$(seq 12); do \
	    timeout 900 python -u examples/full_pipeline.py --workdir runs/pipeline && break; \
	done

native:
	python -c "from pigan_thz_tpu.data.native_io import native_available; \
	           print('native IO available:', native_available())"

clean:
	rm -rf native/build .jax_cache runs
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
