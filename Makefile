.DEFAULT_GOAL := help
.PHONY: test bench train help

test:  ## Run the test suite (virtual 8-device CPU mesh)
	python -m pytest tests/ -q

bench:  ## One-chip PARSeq-S inference throughput (JSON line)
	python bench.py

bench-models:  ## Per-model latency/FLOPs/params
	python -m parseq_tpu.cli.bench --model parseq --batch_size 1
	python -m parseq_tpu.cli.bench --model parseq --batch_size 256

train:  ## Train PARSeq with defaults (expects data/ in reference layout)
	python -m parseq_tpu.cli.train +experiment=parseq

serve:  ## Online serving (set CKPT=path/to/model.ckpt)
	python -m parseq_tpu.cli.serve $(CKPT) --port 8500

help:  ## Display this help
	@grep -E '^[a-zA-Z_-]+:.*?## .*$$' $(MAKEFILE_LIST) | awk 'BEGIN {FS = ":.*?## "}; {printf "\033[36m%-30s\033[0m %s\n", $$1, $$2}'
