"""Mergeable sketch families beyond the HLL core (SURVEY.md §2.5
user-extension surface): each family is {empty, add_batch, merge, finalize,
to_bytes, from_bytes} over pre-hashed numpy arrays."""

from rayhll.sketches.base import Sketch
from rayhll.sketches.bloom import BloomFilter
from rayhll.sketches.countmin import CountMinSketch
from rayhll.sketches.kll import KLLSketch
from rayhll.sketches.minhash import MinHash
from rayhll.sketches.tdigest import TDigest
from rayhll.sketches.theta import ThetaSketch

__all__ = ["Sketch", "BloomFilter", "CountMinSketch", "KLLSketch", "MinHash", "TDigest", "ThetaSketch"]
