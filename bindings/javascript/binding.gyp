{
  "targets": [
    {
      "target_name": "tapecraft",
      "sources": ["lib.c"],
      "libraries": ["-ltapecraft", "-L<!(echo $TAPECRAFT_LIBDIR)"],
      "cflags": ["-O2"]
    }
  ]
}
