from mit_6_5840_mapreduce_spark.mr.api import ihash, mr_run  # noqa: F401
from mit_6_5840_mapreduce_spark.mr.sequential import mr_sequential  # noqa: F401
