from .runner import BenchmarkResult, BenchmarkRunner
