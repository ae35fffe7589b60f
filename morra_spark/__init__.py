"""morra_spark — a PySpark-native knowledge-graph construction engine.

From-scratch reimplementation of the *capabilities* of steysie/morra
(averaged-perceptron POS tagging, dictionary+suffix-rule lemmatization,
joint/separate NER) as vectorized Arrow-UDF stages over tables of
multi-turn conversation transcripts, plus the relational/streaming
operator surface mandated by SURVEY.md §2 Part B and the
training-data-pipeline operators of Part C.

Not a port: the reference is a single-threaded pure-Python NLP library
(see SURVEY.md §0); everything here is designed Spark-first — declarative
DataFrame plans, broadcast model weights, map-only hot path, explicit
partitioning/salting for 10^12-turn scale.
"""

__version__ = "0.1.0"
