"""PySpark-native analytics engine with the capability surface of
wjingmei2011/Kafka-Flink-Slack-Pipeline (see SURVEY.md), extended with
LLM-data-pipeline operators (dedup, similarity search, multimodal columns,
text analysis) designed for 100 TB scale.

Layout:
    session     SparkSession factory tuned for local[32] tests / cluster prod
    schemas     central StructType schemas (email, kafka envelope, slack event)
    tables      testdata table loading + temp-view registration
    functions/  scalar/column function libraries (text clean chain, serde, analysis)
    operators/  relational + LLM-pipeline operators (dedup, similarity, windows)
    sources/    kafka / memory / imap source adapters
    sinks/      slack block-kit assembly + foreachBatch HTTP sink with DLQ
    streaming/  structured-streaming jobs (watermarks, stateful ops)
"""

__version__ = "0.1.0"
