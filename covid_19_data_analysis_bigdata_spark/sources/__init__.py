from covid_19_data_analysis_bigdata_spark.sources.io import load_table

__all__ = ["load_table"]
