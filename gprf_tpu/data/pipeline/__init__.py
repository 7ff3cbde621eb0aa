"""Seismic data pipeline: scrape -> align -> sort -> combine.

Rebuild of the reference ``seismic/`` package: ISC bulletin parsing
(:mod:`gprf_tpu.data.pipeline.isf`), waveform alignment by normalized
cross-correlation (:mod:`gprf_tpu.data.pipeline.align`), and catalog
joining/sorting (:mod:`gprf_tpu.data.pipeline.catalog`).
"""
