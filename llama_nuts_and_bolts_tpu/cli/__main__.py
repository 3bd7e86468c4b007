from llama_nuts_and_bolts_tpu.cli.main import main

if __name__ == "__main__":
    raise SystemExit(main())
