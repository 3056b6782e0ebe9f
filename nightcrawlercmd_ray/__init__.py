"""nightcrawlercmd_ray — a Ray-Data-native data-processing engine.

A from-scratch re-expression of the query/data-processing capabilities of
``mpfund/NightCrawlerCmd`` (reference checkout at ``/root/reference``) on top of
``ray.data.Dataset`` pipelines over zero-copy Arrow batches:

- **crawl**: partitioned URL frontier + fetch scheduler (cuckoo URL-seen filter,
  per-host FIFO politeness lanes, robots gating, BFS-wave priority ordering),
  resumable from per-partition checkpoints. See ``pipelines/crawl.py``.
- **report**: the six CSV reports of the reference's ``report`` tool as Dataset
  aggregations (``pipelines/report.py``).
- **wordlist**: regex-extract → mutate → template → distinct → sort
  (``pipelines/wordlist.py``).
- **scan family**: httpscan vector expansion, bucket classifier, DNS resume
  anti-join, fuzz payload generation — as deterministic Dataset transforms.
- **training-data ops**: exact/MinHash-LSH/SimHash dedup, ANN similarity
  search, language-ID / quality scoring / token counting, multimodal column
  plumbing (``stages/``).

Nothing in this package calls ``ray.init``/``ray.shutdown``; sessions are owned
by the caller (tests' conftest, ``bench.py``, or the evaluation driver).
"""

__version__ = "0.1.0"
