from omim_spark.cli import main

main()
